"""Device-side MP3 Huffman (ops/mp3_huff.py): the vectorized FSM must be
BIT-EXACT against the host C Huffman stage (itself A/B'd against the Python
reference), and the packed BatchDecoder path must match the facade across
stereo modes, linbits escapes, short blocks, and intensity routing."""

import numpy as np
import pytest

from audio_formats_tpu import AudioStream
from audio_formats_tpu.host import native
from audio_formats_tpu.io.source import MemorySource
from audio_formats_tpu import models
from audio_formats_tpu.ops import mp3_huff
from audio_formats_tpu.parallel import BatchDecoder

from golden import mp3_ref


def _facade(data):
    s = AudioStream().open_from_memory(data)
    assert not s.is_error(), s.error_message()
    return s.read_samples_float(10 ** 6)


def _build(rng, channels=2, n_frames=10, big=True, shorts=True,
           mode_ext=None):
    frames = []
    for i in range(n_frames):
        grs = []
        for g in range(2):
            q = np.zeros(576, np.int64)
            k = (i * 2 + g) % 4
            if k == 0:
                idx = rng.choice(300, 40, replace=False)
                q[idx] = rng.integers(-80, 81, 40) if big else \
                    rng.integers(-15, 16, 40)
            elif k == 1:
                idx = rng.choice(500, 120, replace=False)
                q[idx] = rng.integers(-7, 8, 120)
            elif k == 2:  # linbits escapes
                idx = rng.choice(200, 20, replace=False)
                q[idx] = rng.integers(-2000, 2001, 20) if big else \
                    rng.integers(-30, 31, 20)
            else:
                idx = rng.choice(570, 60, replace=False)
                q[idx] = rng.integers(-1, 2, 60)
            gr = {"q": q}
            if shorts and i % 5 == 3:
                gr["block_type"] = 2
            grs.append([dict(gr) for _ in range(channels)])
        frames.append(grs)
    return mp3_ref.build_mp3(frames, channels=channels, mode_ext=mode_ext)


def test_fsm_q_bit_exact(rng):
    """Device FSM q values == the reference Huffman decode, including
    linbits escapes, short blocks, region/table switches, count1."""
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native lib unavailable")
    for channels, big in ((1, False), (1, True), (2, True)):
        data = _build(rng, channels=channels, big=big)
        d_ref = models.probe_all(MemorySource(data))
        d = models.probe_all(MemorySource(data))
        nch, ngr = d.channels, 2
        W, G = 6, 12
        rb = np.zeros(511, np.uint8)
        rl = np.zeros(1, np.int32)
        st = (rb, rl, d._ist_pos)
        LW = native.LANE_WORDS
        while d._offset < len(d._view) - 4:
            bits = np.empty((G * nch, LW), np.uint32)
            meta = np.zeros((G * nch, 16), np.int32)
            scfq = np.empty((G * nch, 40), np.int16)
            aa = np.zeros((G, nch), np.int32)
            wt = np.zeros((G, nch, 32), np.int32)
            flags = np.zeros(W, np.uint8)
            n, new_off, mw, istop = native.mp3_parse_window_packed(
                lib, d._view, d._offset, d._hdr0, W, ngr, nch, st,
                bits, meta, scfq, aa, wt, flags)
            assert not istop
            d._offset = new_off
            if n == 0:
                break
            pats = tuple(sorted(set(int(p) for p in meta[:, 10])))
            cids = {int(mp3_huff.CODE_ID[t]) for t in meta[:, 6:9].ravel()}
            starts, d_pack, rank_of = \
                mp3_huff.breakpoints_for_window(cids)
            ranks = rank_of[meta[:, 6:9]]
            lins = mp3_huff.LINBITS_TAB[meta[:, 6:9]]
            Wb = max(16, int(mw))
            q, _ = mp3_huff.huff_decode(
                bits[:, :Wb], meta[:, 1], meta[:, 2], meta[:, 3],
                meta[:, 4], meta[:, 5],
                ranks[:, 0], ranks[:, 1], ranks[:, 2],
                lins[:, 0], lins[:, 1], lins[:, 2],
                meta[:, 9], meta[:, 10], starts, d_pack,
                pats=pats, W=Wb, NBIG=288, NC1=144)
            q = np.asarray(q)
            for w in range(n):
                if not (flags[w] & 1):
                    continue
                t_ref, fb = d_ref._parse_frame_tensors(d_ref._offset)
                d_ref._offset += fb
                for g in range(ngr):
                    for ch in range(nch):
                        lane = (w * ngr + g) * nch + ch
                        np.testing.assert_array_equal(
                            q[lane], t_ref["q"][0, g, ch].astype(np.int32)
                        )


def test_packed_batch_equals_facade_ms_joint(rng):
    """Mid/side joint stereo through the packed path (the device applies
    the per-frame MS mix; gains carry the −0.5 exponent)."""
    data = _build(rng, channels=2, mode_ext=2)
    ref = _facade(data)
    got = BatchDecoder([data]).decode_all()[0]
    assert got.shape == ref.shape
    peak = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / peak < 4e-6


def test_packed_batch_ms_switching_frames(rng):
    """mode_ext flips between MS and plain LR per frame (real encoders do
    this); the per-lane ms flag must follow the frame headers."""
    ext = [2, 0, 2, 2, 0, 0, 2, 0, 2, 2]
    data = _build(rng, channels=2, mode_ext=ext)
    ref = _facade(data)
    got = BatchDecoder([data]).decode_all()[0]
    peak = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / peak < 4e-6


@pytest.mark.parametrize("mode_ext", [1, 3])
def test_intensity_stream_rides_packed(rng, mode_ext):
    """Intensity-stereo streams (pure and intensity+MS) ride the
    device-Huffman path: the per-band pan mix runs on device from the
    shipped ist plane (ops/mp3_huff._intensity_abcd, minimp3.d:963),
    with zero demotions — matching the facade."""
    data = _build(rng, channels=2, mode_ext=mode_ext)
    ref = _facade(data)
    dec = BatchDecoder([data])
    got = dec.decode_all()[0]
    assert dec.stats["group_demotions"] == 0
    assert dec.stats["windows"] >= 1
    peak = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / peak < 4e-6


def test_mid_stream_intensity_stays_packed(rng):
    """A stream that turns intensity ON mid-stream keeps the packed path
    (the ist plane ships for the windows that need it); a plain lane
    alongside decodes in the same group."""
    ext = [0, 0, 0, 1, 0, 0, 1, 1, 0, 0]
    data = _build(rng, channels=2, mode_ext=ext)
    good = _build(rng, channels=2)  # healthy lane alongside
    dec = BatchDecoder([data, good])
    out = dec.decode_all()
    assert dec.stats["group_demotions"] == 0
    for d, got in zip((data, good), out):
        ref = _facade(d)
        assert got.shape == ref.shape
        peak = np.abs(ref).max() + 1e-9
        assert np.abs(got - ref).max() / peak < 4e-6


def test_packed_disabled_env_matches(rng, monkeypatch):
    """AF_TPU_NO_DEVICE_HUFF forces the classic path; outputs agree."""
    data = _build(rng, channels=2)
    a = BatchDecoder([data]).decode_all()[0]
    monkeypatch.setenv("AF_TPU_NO_DEVICE_HUFF", "1")
    b = BatchDecoder([data]).decode_all()[0]
    peak = np.abs(a).max() + 1e-9
    assert np.abs(a - b).max() / peak < 4e-6


def test_split_bit_plane_matches_plain(rng, monkeypatch):
    """The split bit-plane upload (tight [L, Ws] rows + overflow plane,
    blob_layout Lb > 0) must reproduce the plain full-width layout
    exactly.  Small test windows never trigger the split on cost, so
    force a tiny-Ws plan: every lane overflows into the gather plane."""
    data = _build(rng, channels=2, mode_ext=[2, 0] * 5)
    ref = BatchDecoder([data]).decode_all()[0]

    real_plan = mp3_huff.bits_plan

    def forced(lanew, mw_max, L, lane_words):
        assert real_plan(lanew, mw_max, L, lane_words)[0] >= 16
        return 16, 128, lane_words - 16

    monkeypatch.setattr(mp3_huff, "bits_plan", forced)
    got = BatchDecoder([data]).decode_all()[0]
    np.testing.assert_array_equal(got, ref)


def test_pooled_bit_plane_matches_plain(rng, monkeypatch):
    """The pooled exact-wire bit plane (AF_TPU_MP3_POOL_BITS: lanes ship
    concatenated at their true spans, rows rebuilt on device from the
    cumsum of meta col 15) must reproduce the padded-row layout exactly —
    including the zero-tail contract past each lane's span."""
    data = _build(rng, channels=2, mode_ext=[2, 0] * 5)
    ref = BatchDecoder([data]).decode_all()[0]
    monkeypatch.setenv("AF_TPU_MP3_POOL_BITS", "1")
    got = BatchDecoder([data]).decode_all()[0]
    np.testing.assert_array_equal(got, ref)


def test_pooled_bit_plane_many_lanes(rng, monkeypatch):
    """Pool offsets accumulate across lanes: a multi-stream batch with
    distinct spans (varied content + a mono lane) decodes identically."""
    datas = [_build(rng, channels=2, n_frames=6),
             _build(rng, channels=2, n_frames=4, big=False),
             _build(rng, channels=1, n_frames=5)]
    ref = BatchDecoder(datas).decode_all()
    monkeypatch.setenv("AF_TPU_MP3_POOL_BITS", "1")
    got = BatchDecoder(datas).decode_all()
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(g, r)


def test_bits_plan_cost_model():
    """bits_plan picks the split exactly when it uploads fewer words."""
    L, LW = 4096, native.LANE_WORDS
    lanew = np.full(L, 20, np.int32)
    lanew[:100] = 130              # heavy tail: 100 lanes overflow 24
    ws, lb, wext = mp3_huff.bits_plan(lanew, 130, L, LW)
    assert (ws, lb, wext) == (24, 2048, LW - 24)
    # no tail -> plain bucket (the 24-word bucket is the tightest fit)
    ws, lb, wext = mp3_huff.bits_plan(np.full(L, 20, np.int32), 20, L, LW)
    assert (ws, lb, wext) == (24, 0, 0)
    # tiny windows: padding is cheaper than an overflow plane
    ws, lb, wext = mp3_huff.bits_plan(
        np.full(64, 130, np.int32), 130, 64, LW)
    assert lb == 0 and ws == LW
