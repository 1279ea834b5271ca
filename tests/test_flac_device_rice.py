"""Device-side FLAC frame entropy (ops/flac_rice.py): the FSM must be
BIT-EXACT against the host C parse (af_flac_parse_frame) across every
subframe mode, and the device-Rice BatchDecoder mode
(AF_TPU_FLAC_DEVICE_RICE=1: raw-bytes upload + byte-level sync index,
drflac.d:1149-1242's hot loop on the accelerator) must match the facade."""

import jax.numpy as jnp
import numpy as np
import pytest

import audio_formats_tpu as af
from audio_formats_tpu import models
from audio_formats_tpu.host import native
from audio_formats_tpu.io.source import MemorySource
from audio_formats_tpu.ops import flac_rice
from audio_formats_tpu.parallel import BatchDecoder

from golden import flac_ref


def _need_lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native lib unavailable")
    return lib


def _make(rng, bps=16, C=2, mode="fixed2", stereo="independent",
          bsz=1024, n=4096, wasted=0, escape_bits=None, rice2=False,
          po=2):
    if mode == "constant":
        x = np.full((n, C), 137, np.int64)
    else:
        x = (2000 * np.sin(np.arange(n * C).reshape(n, C) / 7.0)
             + 300 * rng.standard_normal((n, C))).astype(np.int64)
    x = np.clip(x, -(1 << (bps - 1)), (1 << (bps - 1)) - 1)
    if wasted:
        x = (x >> wasted) << wasted
    kw = dict(partition_order=po, rice2=rice2)
    if escape_bits is not None:
        kw["escape_bits"] = escape_bits
    if wasted:
        kw["wasted"] = wasted
    return flac_ref.build_flac(x, 44100, bps, block_size=bsz,
                               stereo_mode=stereo, modes=[mode] * C, **kw)


CASES = [
    ("fixed2", {}),
    ("lpc8", {"mode": "lpc8"}),
    ("constant", {"mode": "constant"}),
    ("verbatim", {"mode": "verbatim"}),
    ("wasted", {"mode": "lpc8", "wasted": 3}),
    ("escape", {"escape_bits": 14}),
    ("rice2", {"rice2": True}),
    ("midside", {"mode": "lpc8", "stereo": "mid_side"}),
    ("leftside", {"stereo": "left_side"}),
    ("bs192", {"bsz": 192, "po": 1}),
]


@pytest.mark.parametrize("name,kw", CASES)
def test_fsm_bit_exact_vs_host(rng, name, kw):
    """FSM residual/coeffs/order/shift/wasted/bps == host C parse."""
    lib = _need_lib()
    kw = dict({"mode": "fixed2"}, **kw)
    data = _make(rng, **kw)
    d = models.probe_all(MemorySource(data))
    view = d._view
    st = np.array([-1, 0, d._cur_bit // 8], np.int64)
    n, offs, dbits, bs, ca, bps = native.flac_sync_index(
        lib, view, int(st[2]), d.bits_per_sample, d.channels, 65535,
        64, st)
    ref_frames, ref_bits = [], []
    while True:
        ref_bits.append(d._cur_bit)
        p = d._parse_frame_tensors()
        if p is None:
            break
        ref_frames.append(p)
    assert n == len(ref_frames)
    assert all(int(o) * 8 == rb for o, rb in zip(offs, ref_bits))

    sizes = list(np.diff(offs)) + [len(view) - int(offs[-1])]
    NPOOL = flac_rice.pool_blocks_needed(sizes)
    pool, base_bits = flac_rice.build_frame_pool(
        [(view, o, sz) for o, sz in zip(offs, sizes)], NPOOL)
    pool = flac_rice.pad_pool(jnp.asarray(pool), NPOOL)
    NSAMP = max(192, max(int(b) for b in bs))
    out = flac_rice.flac_frame_entropy(
        pool, (base_bits + dbits - offs * 8).astype(np.int32),
        bs.astype(np.int32), bps.astype(np.int32), ca.astype(np.int32),
        L=n, NSAMP=NSAMP, nch=d.channels, NPOOL=NPOOL)
    assert not np.asarray(out["err"]).any()
    for fi, p in enumerate(ref_frames):
        bsz, cah, res, cf, orr, sh, wa, bpsh = p
        np.testing.assert_array_equal(
            np.asarray(out["residual"][fi, :, :bsz]), res[:, :bsz])
        np.testing.assert_array_equal(np.asarray(out["coeffs"][fi]), cf)
        np.testing.assert_array_equal(np.asarray(out["order"][fi]), orr)
        np.testing.assert_array_equal(np.asarray(out["shift"][fi]), sh)
        np.testing.assert_array_equal(np.asarray(out["wasted"][fi]), wa)
        np.testing.assert_array_equal(np.asarray(out["sub_bps"][fi]),
                                      bpsh)
        # frame chain: device end position + align + CRC16 == next start
        if fi + 1 < n:
            endb = int(out["end_bits"][fi]) - int(base_bits[fi])
            assert ((endb + 7) // 8) * 8 + 16 == sizes[fi] * 8


def test_device_rice_batch_equals_facade(rng, monkeypatch):
    """AF_TPU_FLAC_DEVICE_RICE=1: raw-bytes upload + device FSM, output
    equal to the facade (mixed subframe modes, ragged lengths)."""
    _need_lib()
    streams = [
        _make(rng, mode="lpc8", stereo="mid_side"),
        _make(rng, n=3000),
        _make(rng, mode="lpc8", wasted=2),
    ]
    refs = []
    for data in streams:
        s = af.AudioStream().open_from_memory(data)
        assert not s.is_error()
        refs.append(s.read_samples_float(10 ** 6))
    monkeypatch.setenv("AF_TPU_FLAC_DEVICE_RICE", "1")
    dec = BatchDecoder(streams)
    got = dec.decode_all()
    assert dec.stats["group_demotions"] == 0
    assert dec.stats.get("rice_host_redo", 0) == 0
    for g, ref in zip(got, refs):
        assert g.shape == ref.shape
        np.testing.assert_allclose(g, ref, atol=0, rtol=0)


def test_device_rice_corrupt_lane_isolated(rng, monkeypatch):
    """A corrupt stream in the device-Rice group must not poison the
    clean lanes (SURVEY §5 error lattice at batch scale)."""
    _need_lib()
    good = _make(rng)
    bad = bytearray(_make(rng))
    bad[len(bad) // 2 :] = b"\xff" * (len(bad) - len(bad) // 2)
    monkeypatch.setenv("AF_TPU_FLAC_DEVICE_RICE", "1")
    dec = BatchDecoder([good, bytes(bad), good])
    got = dec.decode_all()
    s = af.AudioStream().open_from_memory(good)
    ref = s.read_samples_float(10 ** 6)
    for gi in (0, 2):
        assert got[gi] is not None and got[gi].shape == ref.shape
        np.testing.assert_allclose(got[gi], ref, atol=0, rtol=0)


def test_device_rice_one_sample_final_frame(rng, monkeypatch):
    """A 1-sample final frame (legal FLAC; blocksize 1..65535) sits
    within 16 bytes of EOF — the sync index must still find it
    (af_host.cc af_flac_sync_index margin) and the lane must stay
    bit-exact and error-free."""
    _need_lib()
    streams = []
    for i, tail in enumerate((1, 2, 17)):
        n = 1024 * 3 + tail
        x = (rng.standard_normal((n, 2)) * 6000).astype(np.int64)
        streams.append(flac_ref.build_flac(x, 44100, 16,
                                           block_size=1024))
    refs = []
    for data in streams:
        s = af.AudioStream().open_from_memory(data)
        assert not s.is_error()
        refs.append(s.read_samples_float(10 ** 6))
    monkeypatch.setenv("AF_TPU_FLAC_DEVICE_RICE", "1")
    dec = BatchDecoder(streams)
    got = dec.decode_all()
    assert all(e is None for e in dec.errors)
    for g, ref, data in zip(got, refs, streams):
        assert g.shape == ref.shape
        np.testing.assert_array_equal(g, ref)


def test_device_rice_truncation_matches_facade(rng, monkeypatch):
    """An unparseable mid-stream frame truncates the lane exactly like
    the facade (drflac's fewer-samples-on-damage, no sticky error) and
    is counted in stats; clean lanes stay bit-exact."""
    _need_lib()
    good = _make(rng)
    bad = bytearray(_make(rng, n=3000))
    bad[len(bad) // 2 :] = b"\x55" * (len(bad) - len(bad) // 2)
    bad = bytes(bad)
    s = af.AudioStream().open_from_memory(bad)
    ref_bad = s.read_samples_float(10 ** 6)
    monkeypatch.setenv("AF_TPU_FLAC_DEVICE_RICE", "1")
    dec = BatchDecoder([good, bad, good])
    got = dec.decode_all()
    np.testing.assert_array_equal(got[1], ref_bad)
    s = af.AudioStream().open_from_memory(good)
    ref = s.read_samples_float(10 ** 6)
    for gi in (0, 2):
        np.testing.assert_array_equal(got[gi], ref)


def test_build_pool_native_matches_numpy(rng):
    """af_flac_build_pool (C copy + BE byteswap in one pass) is
    bit-identical to the numpy pool builder, including the truncation
    clamp when NPOOL is too small for every frame."""
    lib = _need_lib()
    data = _make(rng, mode="fixed2")
    d = models.probe_all(MemorySource(data))
    view = d._view
    st = np.array([-1, 0, d._cur_bit // 8], np.int64)
    n, offs, dbits, bs, ca, bps = native.flac_sync_index(
        lib, view, int(st[2]), d.bits_per_sample, d.channels, 65535,
        64, st)
    sizes = list(np.diff(offs)) + [len(view) - int(offs[-1])]
    frames = [(view, int(o), int(sz)) for o, sz in zip(offs, sizes)]
    addr, nb, keep = native.buf_addr(view)
    lane_addrs = np.array([addr], np.uint64)
    lanes = [(0, int(o), int(sz)) for o, sz in zip(offs, sizes)]
    for npool in (flac_rice.pool_blocks_needed(sizes),
                  flac_rice.pool_blocks_needed(sizes) - 3):
        ref_pool, ref_bits = flac_rice.build_frame_pool(frames, npool)
        nat_pool, nat_bits = flac_rice.build_frame_pool_native(
            lib, lane_addrs, lanes, npool)
        np.testing.assert_array_equal(nat_pool, ref_pool)
        np.testing.assert_array_equal(nat_bits, ref_bits)


def test_gather_pool_matches_host_pool(rng, monkeypatch):
    """The device-side corpus gather (flac_rice.gather_frame_pool, the
    default single-chip wire) decodes identically to the host pool
    builder path (AF_TPU_FLAC_POOL=host): same PCM, zero demotions.
    The pools themselves differ only in beyond-frame-end tail bytes
    (corpus neighbours vs zeros), which the content-driven FSM never
    consumes."""
    _need_lib()
    streams = [
        _make(rng, mode="lpc8", stereo="mid_side"),
        _make(rng, n=3000),
        _make(rng, mode="fixed2", wasted=1),
        _make(rng, mode="constant"),
    ]
    monkeypatch.setenv("AF_TPU_FLAC_DEVICE_RICE", "1")
    monkeypatch.setenv("AF_TPU_FLAC_POOL", "host")
    dec_h = BatchDecoder(streams)
    ref = dec_h.decode_all()
    assert dec_h.stats.get("rice_host_redo", 0) == 0
    monkeypatch.setenv("AF_TPU_FLAC_POOL", "gather")
    dec_g = BatchDecoder(streams)
    got = dec_g.decode_all()
    assert dec_g.stats.get("rice_host_redo", 0) == 0
    assert dec_g.stats["group_demotions"] == 0
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(g, r)


def test_gather_pool_words_match_host_pool_prefix(rng):
    """gather_frame_pool's assembled words equal the host pool's for
    every in-frame word (the only divergence allowed is the zero vs
    neighbour tail beyond each frame's last byte)."""
    data = _make(rng, mode="fixed2")
    d = models.probe_all(MemorySource(data))
    view = d._view
    lib = _need_lib()
    st = np.array([-1, 0, d._cur_bit // 8], np.int64)
    n, offs, dbits, bs, ca, bps = native.flac_sync_index(
        lib, view, int(st[2]), d.bits_per_sample, d.channels, 65535,
        64, st)
    sizes = list(np.diff(offs)) + [len(view) - int(offs[-1])]
    lanes = [(0, int(o), int(sz)) for o, sz in zip(offs, sizes)]
    frames = [(view, int(o), int(sz)) for o, sz in zip(offs, sizes)]
    npool = flac_rice.pool_blocks_needed(sizes)
    ref_pool, ref_bits = flac_rice.build_frame_pool(frames, npool)

    blk_b = flac_rice.BLK_W * 4
    total = len(view)
    pad = (-total) % 4 + 2 * blk_b
    buf = np.zeros(total + pad, np.uint8)
    buf[:total] = np.frombuffer(view, np.uint8, total, 0)
    zero_off = total + (-total) % 4
    S = len(lanes)
    lane_src, cum_dst, base_bits = flac_rice.gather_pool_meta(
        np.zeros(1, np.int64), lanes, S, zero_off)
    np.testing.assert_array_equal(base_bits, ref_bits)
    got = np.asarray(flac_rice.gather_frame_pool(
        jnp.asarray(buf.view(np.uint32)), lane_src, cum_dst,
        np.int32(zero_off), NPOOL=npool, S=S))
    # compare word-for-word inside each frame's byte extent
    for i, (_, off, sz) in enumerate(lanes):
        b0 = int(ref_bits[i]) // 8
        full_w = sz // 4   # whole in-frame words
        blk0, w0 = b0 // blk_b, 0
        ref_flat = ref_pool.reshape(-1)
        got_flat = got.reshape(-1)
        s = b0 // 4
        np.testing.assert_array_equal(got_flat[s : s + full_w],
                                      ref_flat[s : s + full_w])
