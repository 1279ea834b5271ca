"""Cross-format corruption robustness: the sticky-error contract.

The reference NEVER raises on bad input — every failure sets the stream's
sticky error flag (stream.d:1534 setError; decode APIs return short counts
and isError() disambiguates, stream.d:424-427).  These tests push
mutations of every format through the facade and the batch scheduler:
no exceptions may escape, silent-wrong-output is acceptable only as the
reference's own skip-damaged-frame behavior, and in a batch one corrupt
lane must never poison the others (SURVEY §5 error lattice).
"""

import numpy as np
import pytest

from audio_formats_tpu import AudioStream
from audio_formats_tpu.parallel import BatchDecoder

from golden import flac_ref, mod_ref, mp3_ref, qoa_ref, vorbis_ref, wav_ref


@pytest.fixture
def rng():
    return np.random.default_rng(0xC0FFEE)


def _fixtures(rng):
    t = np.arange(6000)[:, None]
    pcm2 = np.clip(np.round(
        9000 * np.sin(2 * np.pi * 300 * t * [1, 1.4] / 44100)
        + 200 * rng.standard_normal((6000, 2))), -32768, 32767
    ).astype(np.int64)
    s16 = pcm2[:, 0]
    qs = []
    for _ in range(8):
        q = np.zeros(576, np.int64)
        q[rng.choice(400, 50, replace=False)] = rng.integers(-40, 41, 50)
        qs.append(q)
    frames = []
    for i in range(0, 8, 2):
        frames.append([[{"q": qs[i], "block_type": 0, "global_gain": 214}],
                       [{"q": qs[i + 1], "block_type": 0,
                         "global_gain": 214}]])
    fix = vorbis_ref.Fixture(channels=1)
    r = np.zeros(fix.bs0 // 2)
    r[rng.choice(len(r), 30, replace=False)] = \
        rng.integers(-5, 6, 30) * fix.vq_delta
    pat = mod_ref.empty_pattern()
    pat[0][0] = mod_ref.cell(sample=1, period=428, effect=0, param=0)
    return {
        "mp3": mp3_ref.build_mp3(frames, channels=1),
        "flac": flac_ref.build_flac(pcm2, 44100, 16, block_size=1024,
                                    stereo_mode="mid_side",
                                    modes=["lpc8", "fixed3"]),
        "qoa": qoa_ref.encode(s16.reshape(-1, 1).astype(np.int16), 44100),
        "wav": wav_ref.build_wav(wav_ref.pack_pcm(s16, 16), fmt_tag=1,
                                 channels=1, sample_rate=44100, bits=16),
        "vorbis": fix.build([fix.audio_packet([[60, 70, 80, 90]], [r])
                             for _ in range(4)]),
        "mod": mod_ref.build_mod(
            [pat], [0], [(mod_ref.saw_sample(64), 64, 0, 0, 64)]),
        "opus": _opus_fixture(),
        "xm": _xm_fixture(),
    }


def _xm_fixture():
    import importlib.util as _iu
    import os as _os

    spec = _iu.spec_from_file_location(
        "txm", _os.path.join(_os.path.dirname(__file__), "test_xm.py"))
    m = _iu.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m._simple_xm(rows=16)


def _opus_fixture():
    import importlib.util as _iu
    import os as _os

    spec = _iu.spec_from_file_location(
        "tos", _os.path.join(_os.path.dirname(__file__),
                             "test_opus_silk.py"))
    m = _iu.module_from_spec(spec)
    spec.loader.exec_module(m)
    from golden import opus_ref

    pkts = [(bytes.fromhex(h), 960) for h in m.SILK_PACKETS]
    return opus_ref.build_ogg_opus(pkts, channels=1, preskip=0)


def _mutations(data, rng, n=6):
    """Truncations, byte flips, zeroed runs, splices, garbage prefixes —
    deterministic per stream."""
    outs = []
    L = len(data)
    for cut in (L // 5, L // 2, L - 3):
        outs.append(data[:cut])
    for _ in range(n):
        b = bytearray(data)
        for pos in rng.integers(0, L, 24):
            b[pos] ^= rng.integers(1, 256)
        outs.append(bytes(b))
    b = bytearray(data)
    mid = L // 3
    b[mid : mid + min(512, L - mid)] = b"\x00" * min(512, L - mid)
    outs.append(bytes(b))
    for _ in range(3):  # splice out a random chunk
        i, j = sorted(rng.integers(0, L, 2))
        outs.append(data[:i] + data[j:])
    outs.append(bytes(rng.integers(0, 256, 64, dtype=np.uint8)) + data)
    return outs


def test_facade_never_raises_on_corruption(rng):
    for kind, data in _fixtures(rng).items():
        for i, bad in enumerate(_mutations(data, rng)):
            s = AudioStream()
            s.open_from_memory(bad)
            if s.is_error():
                assert isinstance(s.error_message(), str)
                continue
            total = 0
            for _ in range(200):
                out = s.read_samples_float(4096)
                assert np.isfinite(np.asarray(out)).all(), (kind, i)
                if out.shape[0] == 0:
                    break
                total += out.shape[0]
            # error flag (if any) must be a string, never an exception
            if s.is_error():
                assert isinstance(s.error_message(), str)


def test_per_lane_demotion_keeps_group(rng, monkeypatch):
    """One poisoned lane in a 64-lane grouped batch must NOT take the
    innocent lanes off the device path: the scheduler bisects the chunk,
    demotes exactly the guilty lane (stats['lanes_demoted'] == 1), records
    the exception class, and the innocent lanes stay grouped and bit-exact
    (the per-stream error containment of stream.d:424-427 at batch scale,
    without the round-2 all-or-nothing perf cliff)."""
    from audio_formats_tpu.errors import AudioFormatError
    from audio_formats_tpu.models.flac import FlacDecoder

    streams = []
    for k in range(64):
        n = 2048 + 64 + 7 * k  # distinct lengths mark the lanes
        t = np.arange(n)[:, None]
        x = np.clip(np.round(
            6000 * np.sin(2 * np.pi * (220 + 3 * k) * t * [1, 1.31] / 44100)
        ), -32768, 32767).astype(np.int64)
        streams.append(flac_ref.build_flac(
            x, 44100, 16, block_size=1024, stereo_mode="mid_side",
            modes=["lpc8", "fixed3"]))
    bad_len = len(streams[13])
    assert sum(len(s) == bad_len for s in streams) == 1
    # inject at both parse seams: the grouped scheduler's window call and
    # the per-stream fallback's frame call
    from audio_formats_tpu.host import native as af_native

    orig = FlacDecoder._parse_frame_tensors

    def patched(self):
        if len(self._view) == bad_len:
            raise AudioFormatError("injected lane fault")
        return orig(self)

    monkeypatch.setattr(FlacDecoder, "_parse_frame_tensors", patched)
    orig_win = af_native.flac_parse_window

    def patched_win(lib, data, *a, **kw):
        if len(data) == bad_len:
            raise AudioFormatError("injected lane fault")
        return orig_win(lib, data, *a, **kw)

    monkeypatch.setattr(af_native, "flac_parse_window", patched_win)
    # the chunked C window parse: a fault there costs the whole chunk
    # one exception — the bisect narrows it to the single bad lane
    orig_multi = af_native.flac_parse_window_multi

    def patched_multi(lib, lanes, data_ptrs, data_lens, *a, **kw):
        if any(int(data_lens[bi]) == bad_len for bi in lanes):
            raise AudioFormatError("injected lane fault")
        return orig_multi(lib, lanes, data_ptrs, data_lens, *a, **kw)

    monkeypatch.setattr(af_native, "flac_parse_window_multi",
                        patched_multi)
    dec = BatchDecoder(streams)
    out = dec.decode_all()
    assert dec.stats["lanes_demoted"] == 1
    assert any("injected lane fault" in e
               for e in dec.stats["group_exceptions"])
    assert out[13] is None and dec.errors[13] is not None
    clean = [s for i, s in enumerate(streams) if i != 13]
    solo = BatchDecoder(clean).decode_all()
    j = 0
    for i in range(64):
        if i == 13:
            continue
        np.testing.assert_array_equal(out[i], solo[j])
        j += 1


def test_batch_lattice_isolates_corrupt_lanes_pool_mode(rng, monkeypatch):
    """The MP3 pooled bit plane must keep the error lattice intact: the
    pool offsets come from a cumsum over ALL lanes, so a corrupt lane
    (span 0 after parse failure) must not shift its neighbours."""
    monkeypatch.setenv("AF_TPU_MP3_POOL_BITS", "1")
    fx = _fixtures(rng)
    good = fx["mp3"]
    b = bytearray(good)
    for pos in rng.integers(len(b) // 4, len(b), 32):
        b[pos] ^= 0xFF
    bad = bytes(b)
    items = [good, bad, good, bad, good]
    out = BatchDecoder(items).decode_all()
    solo = BatchDecoder([good]).decode_all()[0]
    for i in (0, 2, 4):
        assert out[i] is not None and out[i].shape == solo.shape
        peak = np.abs(solo).max() + 1e-9
        assert np.abs(out[i] - solo).max() / peak < 4e-6
    for j in (1, 3):
        assert out[j] is None or np.isfinite(np.asarray(out[j])).all()


def test_batch_lattice_isolates_corrupt_lanes(rng):
    """One corrupted lane per format, mixed with good lanes: good lanes
    must produce exactly their solo-decode output."""
    fx = _fixtures(rng)
    goods = list(fx.values())
    bads = []
    for data in goods:
        b = bytearray(data)
        for pos in rng.integers(len(b) // 4, len(b), 32):
            b[pos] ^= 0xFF
        bads.append(bytes(b))
    items = goods + bads
    dec = BatchDecoder(items)
    out = dec.decode_all()
    exact = {"flac", "qoa", "wav"}  # integer pipelines: lane-count exact
    for i, (kind, data) in enumerate(fx.items()):
        solo = BatchDecoder([data]).decode_all()[0]
        assert out[i] is not None
        assert out[i].shape == solo.shape
        if kind in exact:
            np.testing.assert_array_equal(out[i], solo)
        else:
            # float paths may differ in ulps when the batch shape (and
            # thus XLA's vectorization) changes with corrupt lanes present
            peak = np.abs(solo).max() + 1e-9
            assert np.abs(out[i] - solo).max() / peak < 4e-6, kind
    # corrupt lanes: either decoded (reference skips damaged frames),
    # errored, or empty — but never poisoning the run
    for j in range(len(goods), len(items)):
        assert out[j] is None or np.isfinite(np.asarray(out[j])).all()
