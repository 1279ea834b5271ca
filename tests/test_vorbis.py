"""Ogg Vorbis conformance: golden fixtures with chosen floor/residue content
vs the independent float64 expectation model, coupling, block-size
transitions, truncation, seek, and the Ogg layer itself."""

import numpy as np
import pytest

from audio_formats_tpu import AudioFileFormat, AudioStream
from audio_formats_tpu.io import ogg

from golden import vorbis_ref


def _mk_frames(fix, rng, count, long_pattern=None):
    """Random fixture frames: posts + grid residues."""
    frames = []
    ch = fix.channels
    for i in range(count):
        long_block = bool(long_pattern[i]) if long_pattern else False
        n2 = (fix.bs1 if long_block else fix.bs0) // 2
        posts = []
        residues = []
        for c in range(ch):
            if rng.random() < 0.1 and i > 0:
                posts.append(None)  # unused channel
                residues.append(np.zeros(n2))
                continue
            posts.append([int(rng.integers(40, 100)) for _ in range(4)])
            r = np.zeros(n2)
            idx = rng.choice(n2, size=n2 // 4, replace=False)
            r[idx] = rng.integers(-5, 6, size=idx.size) * fix.vq_delta
            residues.append(r)
        fr = {"posts": posts, "residues": residues, "long": long_block}
        if long_pattern:
            prev_long = bool(long_pattern[i - 1]) if i > 0 else True
            next_long = (bool(long_pattern[i + 1])
                         if i + 1 < count else True)
            fr["prev"] = 1 if prev_long else 0
            fr["next"] = 1 if next_long else 0
        frames.append(fr)
    return frames


def _encode(fix, frames, **kw):
    packets = [
        fix.audio_packet(fr["posts"], fr["residues"],
                         long_block=fr.get("long", False),
                         prev_flag=fr.get("prev", 1),
                         next_flag=fr.get("next", 1))
        for fr in frames
    ]
    return fix.build(packets, **kw)


def _open(data):
    s = AudioStream().open_from_memory(data)
    assert not s.is_error(), s.error_message()
    assert s.get_format() == AudioFileFormat.ogg
    return s


def test_ogg_page_roundtrip(rng):
    pkts = [bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
            for n in (1, 255, 256, 700, 0, 33)]
    page = ogg.build_page(pkts[:3], serial=7, seq=0, granule=1234, bos=True)
    page += ogg.build_page(pkts[3:], serial=7, seq=1, granule=999, eos=True)
    view = memoryview(page)
    r = ogg.OggPacketReader(view, serial=7)
    got = []
    while True:
        pk = r.next_packet()
        if pk is None:
            break
        got.append(pk)
    assert [g[0] for g in got] == pkts
    assert got[2][1] == 1234 and got[5][1] == 999
    assert ogg.last_granule(view, 7) == 999


def test_mono_decode_matches_expectation(rng):
    fix = vorbis_ref.Fixture(channels=1)
    frames = _mk_frames(fix, rng, 12)
    data = _encode(fix, frames)
    s = _open(data)
    assert s.get_samplerate() == 44100.0
    assert s.get_num_channels() == 1
    got = s.read_samples_float(10**6)
    ref = vorbis_ref.expected_output(fix, frames)
    assert s.get_length_in_frames() == ref.shape[0]
    assert got.shape == ref.shape
    scale = np.max(np.abs(ref)) + 1e-12
    assert np.max(np.abs(got - ref)) / scale < 1e-4


def test_stereo_coupling(rng):
    fix = vorbis_ref.Fixture(channels=2, coupling=True)
    frames = _mk_frames(fix, rng, 8)
    data = _encode(fix, frames)
    got = _open(data).read_samples_float(10**6)
    ref = vorbis_ref.expected_output(fix, frames)
    assert got.shape == ref.shape
    scale = np.max(np.abs(ref)) + 1e-12
    assert np.max(np.abs(got - ref)) / scale < 1e-4


def test_two_blocksizes_with_transitions(rng):
    fix = vorbis_ref.Fixture(channels=1, bs0=256, bs1=1024)
    pattern = [0, 0, 1, 1, 0, 1, 0, 0, 1, 1, 1, 0]
    frames = _mk_frames(fix, rng, len(pattern), long_pattern=pattern)
    data = _encode(fix, frames)
    got = _open(data).read_samples_float(10**6)
    ref = vorbis_ref.expected_output(fix, frames)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    scale = np.max(np.abs(ref)) + 1e-12
    assert np.max(np.abs(got - ref)) / scale < 1e-4


def test_final_granule_truncation(rng):
    fix = vorbis_ref.Fixture(channels=1)
    frames = _mk_frames(fix, rng, 8)
    ref_full = vorbis_ref.expected_output(fix, frames)
    cut = ref_full.shape[0] - 100
    data = _encode(fix, frames, final_granule=cut)
    s = _open(data)
    assert s.get_length_in_frames() == cut
    got = s.read_samples_float(10**6)
    assert got.shape[0] == cut
    scale = np.max(np.abs(ref_full)) + 1e-12
    assert np.max(np.abs(got - ref_full[:cut]) / scale) < 1e-4


def test_chunked_equals_whole(rng):
    fix = vorbis_ref.Fixture(channels=2, coupling=True)
    frames = _mk_frames(fix, rng, 10)
    data = _encode(fix, frames)
    whole = _open(data).read_samples_float(10**6)
    s = _open(data)
    parts = []
    while True:
        c = s.read_samples_float(123)
        if c.shape[0] == 0:
            break
        parts.append(c)
    np.testing.assert_array_equal(np.concatenate(parts), whole)


def test_seek_contract_and_accuracy(rng):
    fix = vorbis_ref.Fixture(channels=1)
    frames = _mk_frames(fix, rng, 20)
    data = _encode(fix, frames, per_page=3)
    s = _open(data)
    L = s.get_length_in_frames()
    whole = _open(data).read_samples_float(10**6)
    assert whole.shape[0] == L
    assert s.tell_position() == 0
    assert s.seek_position(0)
    assert not s.seek_position(-1)
    assert not s.seek_position(L + 1)
    assert s.seek_position(L - 1)
    assert s.read_samples_float(10).shape[0] == 1
    assert s.seek_position(L)
    assert s.read_samples_float(10).shape[0] == 0
    assert not s.is_error()
    scale = np.max(np.abs(whole)) + 1e-12
    for target in (0, 1, 200, 255, 256, 1000, 2500, L - 7):
        assert s.seek_position(target), target
        assert s.tell_position() == target
        got = s.read_samples_float(64)
        ref = whole[target : target + 64]
        assert got.shape == ref.shape
        assert np.max(np.abs(got - ref)) / scale < 1e-4, target


def test_garbage_rejected():
    s = AudioStream().open_from_memory(b"OggS" + b"\x00" * 100)
    assert s.is_error()


def test_unused_floor0_config_tolerated(rng):
    """A setup header carrying a floor0 CONFIG that no mapping uses must
    decode normally — stb_vorbis parses floor0 at setup and errors only
    when a packet uses one (stb_vorbis2.d:3019-3031, :2260)."""
    fix = vorbis_ref.Fixture(channels=1)
    frames = _mk_frames(fix, rng, 6)
    ref = _open(_encode(fix, frames)).read_samples_float(10 ** 6)

    fix0 = vorbis_ref.Fixture(channels=1, extra_floor0=True)
    data = _encode(fix0, frames)
    out = _open(data).read_samples_float(10 ** 6)
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-7)


def test_non_audio_packet_mid_stream_skipped(rng):
    """A packet whose first bit marks it non-audio (or whose mode index
    is out of range) must be SKIPPED mid-stream, not crash the read —
    stb_vorbis treats it as invalid and resynchronizes
    (stb_vorbis2.d:2300 vorbis_decode_initial returning false).
    Regression: the entropy stage returned a (None, 0) tuple that the
    caller then subscripted (fuzz finding)."""
    fix = vorbis_ref.Fixture(channels=1)
    frames = _mk_frames(fix, rng, 6)
    packets = [
        fix.audio_packet(fr["posts"], fr["residues"])
        for fr in frames
    ]
    ref = _open(fix.build(packets)).read_samples_float(10 ** 6)
    pre = _open(fix.build(packets[:3])).read_samples_float(10 ** 6)
    # splice a non-audio (type-odd first bit) packet mid-stream: it must
    # be skipped; the stream stays decodable and the pre-junk prefix is
    # untouched.  (A garbage packet whose first bit is 0 decodes as a
    # garbage AUDIO packet — also crash-free, but alters PCM, so only
    # the odd-bit case checks sample equality.)
    bad = packets[:3] + [(bytes([0x01, 0x55]), 0)] + packets[3:]
    out = _open(fix.build(bad)).read_samples_float(10 ** 6)
    assert np.isfinite(np.asarray(out)).all()
    k = len(pre)
    assert k > 0 and len(out) >= k
    np.testing.assert_allclose(out[:k], ref[:k], rtol=0, atol=1e-7)
    # garbage audio-typed packet: crash-free, finite output (regression:
    # the entropy stage returned a (None, 0) tuple on a bad mode index)
    bad2 = packets[:3] + [(bytes([0xFE]), 0)] + packets[3:]
    out2 = _open(fix.build(bad2)).read_samples_float(10 ** 6)
    assert np.isfinite(np.asarray(out2)).all()


def test_native_floor1_matches_python(rng):
    """The C floor1 decode (af_host.cc:af_vorbis_floor1) must be
    bit-identical to the Python _decode_floor1 loop on full streams —
    coupled stereo, block transitions, AND truncated packets (the
    end-of-packet abort leaves trailing channels unused in both paths)."""
    import os

    from audio_formats_tpu.host import native

    if native.get_lib() is None:
        import pytest

        pytest.skip("native library unavailable")

    for kw, pat in [
        (dict(channels=2, coupling=True), None),
        (dict(channels=1, bs0=256, bs1=1024),
         [0, 0, 1, 1, 0, 1, 0, 0, 1, 1, 1, 0]),
    ]:
        fix = vorbis_ref.Fixture(**kw)
        frames = _mk_frames(fix, rng, 12 if pat else 8, long_pattern=pat)
        packets = [fix.audio_packet(fr["posts"], fr["residues"],
                                    long_block=fr.get("long", False))
                   if "long" in fr else
                   fix.audio_packet(fr["posts"], fr["residues"])
                   for fr in frames]
        # cut mid-stream packets short at several depths so end-of-packet
        # hits mid-floor AND mid-residue (page CRC stays valid: the cut
        # happens before the page is built)
        for k, frac in [(3, 0.25), (5, 0.6), (7, 0.9)]:
            pb, gr = packets[k]
            packets[k] = (pb[: max(2, int(len(pb) * frac))], gr)
        data = fix.build(packets)
        got_nat = _open(bytes(data)).read_samples_float(10 ** 6)
        os.environ["AF_TPU_NO_NATIVE"] = "1"
        try:
            got_py = _open(bytes(data)).read_samples_float(10 ** 6)
        finally:
            os.environ.pop("AF_TPU_NO_NATIVE", None)
        assert got_nat.shape == got_py.shape
        assert np.array_equal(np.asarray(got_nat), np.asarray(got_py))
