"""Native host stage ↔ pure-Python reference equality (bit-for-bit)."""

import numpy as np
import pytest

from audio_formats_tpu.host import native
from audio_formats_tpu.io.bits import BitReaderMSB
from audio_formats_tpu.io.source import MemorySource
import audio_formats_tpu.models.mp3 as mp3_mod
from audio_formats_tpu.models.flac import FlacDecoder

from golden import flac_ref, mp3_ref


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native host stage unavailable")
    return lib


def test_flac_parse_equivalence(lib, rng):
    t = np.arange(4000)[:, None]
    pcm = np.clip(
        np.round(9000 * np.sin(2 * np.pi * 300 * t * [1, 1.3] / 44100)
                 + 500 * rng.standard_normal((4000, 2))),
        -32768, 32767,
    ).astype(np.int64)
    for stereo, modes, kw in [
        ("mid_side", ["lpc8", "fixed3"], {}),
        ("left_side", ["fixed2", "lpc4"], {"partition_order": 2}),
        ("independent", ["verbatim", "constant"], {}),
    ]:
        if modes[1] == "constant":
            pcm2 = pcm.copy()
            pcm2[:, 1] = 77
        else:
            pcm2 = pcm
        data = flac_ref.build_flac(pcm2, 44100, 16, block_size=1024,
                                   stereo_mode=stereo, modes=modes, **kw)
        dec = FlacDecoder(MemorySource(data))
        bit = dec._first_frame_pos * 8
        for _ in range(3):
            b = BitReaderMSB(dec._view)
            b.seek_bits(bit)
            blocksize, ca, subs = dec._parse_frame(b)
            nat = native.flac_parse_frame(lib, dec._view, bit, 16, 2, 65535)
            assert nat is not None
            assert nat["blocksize"] == blocksize
            assert nat["chan_assignment"] == ca
            for ci, s in enumerate(subs):
                np.testing.assert_array_equal(nat["residual"][ci], s.residual)
                np.testing.assert_array_equal(nat["coeffs"][ci], s.coeffs)
                assert nat["order"][ci] == s.order
                assert nat["shift"][ci] == s.shift
                assert nat["wasted"][ci] == s.wasted
                assert nat["bps"][ci] == s.bps
            assert nat["end_bits"] == b.tell_bits()
            bit = nat["end_bits"]


def test_mp3_huffman_equivalence(lib, rng):
    qs = []
    for kind in range(6):
        q = np.zeros(576, dtype=np.int64)
        if kind % 3 == 0:  # dense small values + count1 tail
            idx = rng.choice(380, size=60, replace=False)
            q[idx] = rng.integers(-40, 41, size=60)
            idx2 = 380 + rng.choice(150, size=60, replace=False)
            q[idx2] = rng.integers(-1, 2, size=60)
        elif kind % 3 == 1:  # linbits escapes
            q[:24] = rng.integers(-8000, 8000, size=24)
        qs.append(q)
    data = mp3_ref.build_mp3(
        [[[{"q": qs[i]}], [{"q": qs[i + 1]}]] for i in range(0, 6, 2)],
        channels=1, global_gain=120,
    )
    captured = []
    orig = mp3_mod._huffman

    def spy(br, gr, scf, limit):
        start = br.pos
        res = orig(br, gr, scf, limit)
        captured.append((br.buf, start, limit, gr, scf.copy(), res))
        return res

    mp3_mod._huffman = spy
    mp3_mod._NATIVE_CACHE.clear()
    mp3_mod._NATIVE_CACHE.append(None)  # force the python path
    try:
        dec = mp3_mod.Mp3Decoder(MemorySource(data))
        dec.read(6 * 576)
    finally:
        mp3_mod._huffman = orig
        mp3_mod._NATIVE_CACHE.clear()
    assert len(captured) == 6
    for buf, start, limit, gr, scf, (qpy, gpy) in captured:
        nat = native.mp3_huffman(
            lib, buf, start, limit, gr.table_select, gr.region_count,
            gr.sfbtab, scf, gr.big_values, gr.count1_table,
        )
        assert nat is not None
        np.testing.assert_array_equal(nat[0], qpy)
        np.testing.assert_array_equal(nat[1], gpy)


def test_flac_pack_gather_matches_scatter_pack(lib, rng):
    """af_flac_widths_gather / af_flac_pack_gather == the scatter +
    af_flac_widths / af_flac_pack contract the batch scheduler replaced
    (batch.py _flac_dispatch): per-row pointers with valid lengths, a
    NULL padding row, garbage beyond ns that must read as zero, and the
    warm side-channel emitted in the same pass."""
    import ctypes as ct

    i32p = ct.POINTER(ct.c_int32)
    i64p = ct.POINTER(ct.c_int64)
    u32p = ct.POINTER(ct.c_uint32)
    L, n = 7, 256
    # parser-style buffer: np.empty semantics -> garbage beyond each
    # row's valid sample count
    buf = rng.integers(-(1 << 20), 1 << 20, (L, 400), dtype=np.int64)\
        .astype(np.int32)
    ns = np.array([256, 100, 0, 192, 33, 1, 256], np.int32)
    orders = np.array([8, 0, 32, 4, 12, 1, 31], np.int32)
    rows = np.zeros(L, np.int64)
    for l in range(L):
        if l != 2:          # row 2: NULL padding row
            rows[l] = buf[l].ctypes.data
    # reference: the old scatter into a zero-padded [L, n] layout
    residual = np.zeros((L, n), np.int32)
    for l in range(L):
        if rows[l]:
            residual[l, : ns[l]] = buf[l, : ns[l]]
    w_ref = np.zeros(L, np.int32)
    wmax_ref = lib.af_flac_widths(
        residual.ctypes.data_as(i32p), L, n,
        orders.ctypes.data_as(i32p), w_ref.ctypes.data_as(i32p))
    w_got = np.zeros(L, np.int32)
    wmax_got = lib.af_flac_widths_gather(
        rows.ctypes.data_as(i64p), L, n, ns.ctypes.data_as(i32p),
        orders.ctypes.data_as(i32p), w_got.ctypes.data_as(i32p))
    assert wmax_got == wmax_ref
    np.testing.assert_array_equal(w_got, w_ref)
    for w in (int(wmax_ref), 32):
        stride = (n * w + 31) // 32 + 1
        p_ref = np.full((L, stride), 0xAAAAAAAA, np.uint32)
        lib.af_flac_pack(residual.ctypes.data_as(i32p), L, n,
                         orders.ctypes.data_as(i32p), w,
                         p_ref.ctypes.data_as(u32p), stride)
        p_got = np.full((L, stride), 0x55555555, np.uint32)
        warm = np.full((L, 32), -1, np.int32)
        lib.af_flac_pack_gather(
            rows.ctypes.data_as(i64p), L, n, ns.ctypes.data_as(i32p),
            orders.ctypes.data_as(i32p), w,
            p_got.ctypes.data_as(u32p), stride,
            warm.ctypes.data_as(i32p))
        # old pack leaves at most one trailing word defined-zero; compare
        # the words the device unpack actually reads
        used = (n * w + 31) // 32
        np.testing.assert_array_equal(p_got[:, :used], p_ref[:, :used])
        assert (p_got[:, used:] == 0).all()
        np.testing.assert_array_equal(warm, residual[:, :32])


def test_u32_pack_prefix_rows_matches_fancy_index(lib, rng):
    """af_u32_pack_prefix_rows == the boolean fancy-index pool build it
    replaced (batch.py MP3 pooled bit plane)."""
    import ctypes as ct

    i32p = ct.POINTER(ct.c_int32)
    u32p = ct.POINTER(ct.c_uint32)
    L, LW = 23, 96
    flat = rng.integers(0, 1 << 32, (L, LW), dtype=np.uint64)\
        .astype(np.uint32)
    sp = rng.integers(0, LW + 1, L).astype(np.int32)
    sp[3] = 0
    sp[5] = LW
    ref = flat[np.arange(LW)[None, :] < sp[:, None]]
    out = np.empty(int(sp.sum()), np.uint32)
    nw = lib.af_u32_pack_prefix_rows(
        flat.ctypes.data_as(u32p), L, LW,
        sp.ctypes.data_as(i32p), out.ctypes.data_as(u32p))
    assert nw == ref.size
    np.testing.assert_array_equal(out, ref)
