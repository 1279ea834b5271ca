"""FastTracker II XM engine tests: loading, pitch, envelopes, effects,
loop-stop, module API."""

import numpy as np
import pytest

from audio_formats_tpu import AudioFileFormat, AudioStream

from golden import xm_ref


def _square_sample(length=32, amp=100, loop=True):
    data = np.where(np.arange(length) < length // 2, amp, -amp).astype(np.int8)
    return {
        "data": data, "volume": 64, "loop_type": 1 if loop else 0,
        "loop_start": 0, "loop_len": length if loop else 0,
        "relative_note": 0, "bits": 8,
    }


def _simple_xm(rows=16, notes=((0, 49),), fx=(), tempo=6, bpm=125,
               instruments=None, vol_env=None, fadeout=0):
    """notes: (row, note) pairs on channel 0; fx: (row, ch, fx, param)."""
    channels = 4
    pat = xm_ref.empty_rows(rows, channels)
    for row, note in notes:
        pat[row][0] = xm_ref.cell(note=note, instr=1)
    for row, ch, fxt, param in fx:
        c = pat[row][ch]
        pat[row][ch] = (c[0], c[1], c[2], fxt, param)
    instruments = instruments or [
        {"samples": [_square_sample()], "vol_env": vol_env,
         "fadeout": fadeout}
    ]
    return xm_ref.build_xm([pat], [0], instruments, channels=channels,
                           tempo=tempo, bpm=bpm)


def _open(data):
    s = AudioStream().open_from_memory(data)
    assert not s.is_error(), s.error_message()
    assert s.get_format() == AudioFileFormat.xm
    return s


def test_probe_and_metadata():
    s = _open(_simple_xm())
    assert s.get_samplerate() == 44100.0
    assert s.get_num_channels() == 2
    assert s.get_length_in_frames() == -1
    assert s.is_module()
    assert s.count_module_patterns() == 1
    assert s.get_module_length() == 1
    assert s.rows_in_pattern(0) == 16
    assert s.rows_in_pattern(5) == -1
    assert s.frames_remaining_in_pattern() == -1  # unimplemented in reference


def test_renders_and_stops_after_loop():
    s = _open(_simple_xm())
    total = 0
    for _ in range(100):
        c = s.read_samples_float(8192)
        if c.shape[0] == 0:
            break
        total += c.shape[0]
    # one pattern: 16 rows * 6 ticks * (44100/(125*0.4)) = 16*6*882
    expected = 16 * 6 * 882
    assert total >= expected  # generate pads with zeros to chunk size
    assert s.read_samples_float(100).shape[0] == 0


def test_tone_pitch_linear():
    # note 49 (A-4 with relative 0) => linear period 7680-48*64=4608
    # => frequency 8363 Hz; square wave of 32 samples loops at 8363/32 Hz
    s = _open(_simple_xm(notes=((0, 49),)))
    y = s.read_samples_float(30000)[:, 0]
    y = y[2000:28000]
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    peak = np.argmax(spec[5:]) + 5
    freq = peak * 44100 / len(y)
    expect = 8363.0 / 32
    assert abs(freq - expect) / expect < 0.03, (freq, expect)


def test_volume_effect_and_key_off():
    loud = _open(_simple_xm(fx=((0, 0, 0xC, 0x40),))).read_samples_float(8000)
    quiet = _open(_simple_xm(fx=((0, 0, 0xC, 0x10),))).read_samples_float(8000)
    assert np.abs(quiet[3000:]).max() < np.abs(loud[3000:]).max() * 0.5
    # key off without envelope cuts the note
    cut = _open(_simple_xm(notes=((0, 49), (4, 97)))).read_samples_float(44100)
    tail = cut[30000:]
    assert np.abs(tail).max() < 1e-4


def test_volume_envelope_decay_and_fadeout():
    env = {"points": [(0, 64), (40, 0)], "sustain_on": False}
    data = _simple_xm(notes=((0, 49),), vol_env=env, fadeout=2000, rows=32)
    y = _open(data).read_samples_float(60000)[:, 0]
    early = np.abs(y[1000:5000]).max()
    late = np.abs(y[40000:50000]).max()
    assert late < early * 0.2


def test_arpeggio_and_portamento_smoke():
    data = _simple_xm(
        rows=32,
        notes=((0, 49),),
        fx=tuple((r, 0, 0x0, 0x37) for r in range(1, 8))  # arpeggio
        + tuple((r, 0, 0x1, 0x08) for r in range(8, 16)),  # porta up
    )
    y = _open(data).read_samples_float(70000)
    assert np.abs(y).max() > 0.01
    assert np.all(np.isfinite(y))


def test_pattern_jump_and_seek():
    pat0 = xm_ref.empty_rows(8, 4)
    pat0[0][0] = xm_ref.cell(note=49, instr=1)
    pat1 = xm_ref.empty_rows(8, 4)
    pat1[0][0] = xm_ref.cell(note=61, instr=1)
    data = xm_ref.build_xm([pat0, pat1], [0, 1],
                           [{"samples": [_square_sample()]}], channels=4)
    s = _open(data)
    s.read_samples_float(8 * 6 * 882 + 100)
    assert s.tell_module_pattern() >= 1
    assert s.seek_position(1, 4)
    assert s.tell_module_pattern() == 1
    assert s.tell_module_row() >= 4
    assert not s.seek_position(500)  # frame seek rejected for modules


def test_16bit_sample_and_amiga_frequencies():
    data16 = (np.sin(2 * np.pi * np.arange(64) / 64) * 20000).astype(np.int16)
    ins = [{"samples": [{
        "data": data16, "volume": 64, "loop_type": 1, "loop_start": 0,
        "loop_len": 64, "relative_note": 0, "bits": 16,
    }]}]
    pat = xm_ref.empty_rows(8, 4)
    pat[0][0] = xm_ref.cell(note=49, instr=1)
    data = xm_ref.build_xm([pat], [0], ins, channels=4, linear=False)
    y = _open(data).read_samples_float(20000)
    assert np.abs(y).max() > 0.01
    assert np.all(np.isfinite(y))


def test_not_an_xm_rejected():
    s = AudioStream().open_from_memory(b"Extended Nodule: " + b"\0" * 100)
    assert s.is_error()


def test_vectorized_mixer_matches_scalar():
    """The vectorized per-segment mixer must reproduce the per-sample
    reference loop exactly for every loop type (incl. ping-pong phase
    reflection and notes starting below loop_start)."""
    import audio_formats_tpu.models.xm as xmmod

    wave = (np.sin(2 * np.pi * np.arange(64) / 64) * 120).astype(np.int8)
    K = [getattr(xmmod, n) for n in dir(xmmod)
         if hasattr(getattr(xmmod, n), "_chan_segment")][0]
    for loop_type, ls, ll, note in ((0, 0, 64, 52), (1, 8, 48, 60),
                                    (2, 8, 48, 52), (2, 20, 10, 45)):
        instr = {"samples": [{"data": wave, "volume": 64, "finetune": 0,
                              "loop_type": loop_type, "loop_start": ls,
                              "loop_len": ll, "panning": 100,
                              "relative_note": 0, "bits": 8}],
                 "sample_of_notes": [0] * 96, "vol_env": None,
                 "fadeout": 512}
        rows = [[(note, 1, 0, 0, 0)]] + [[(0, 0, 0, 0, 0)]
                                         for _ in range(15)]
        data = xm_ref.build_xm([rows], [0], [instr], channels=1)
        s1 = AudioStream()
        s1.open_from_memory(data)
        v = s1.read_samples_float(20000)
        orig = K._chan_segment
        try:
            K._chan_segment = \
                lambda self, ch, m: self._chan_segment_scalar(ch, m)
            s2 = AudioStream()
            s2.open_from_memory(data)
            ref = s2.read_samples_float(20000)
        finally:
            K._chan_segment = orig
        assert np.array_equal(v, ref), loop_type


def test_tell_position_tracks_module_playback():
    """Modules report frames emitted since open / last (pattern,row) seek
    (the reference asserts !isModule() at stream.d:1209 instead)."""
    s = _open(_simple_xm(rows=32))
    assert s.tell_position() == 0
    a = s.read_samples_float(777)
    assert s.tell_position() == len(a)
    assert s.seek_position(0, 0)
    assert s.tell_position() == 0
    b = s.read_samples_float(128)
    assert s.tell_position() == len(b)


def test_linear_interpolation_switch():
    """XM_LINEAR_INTERPOLATION parity (libxm.d:50): off by default (the
    reference distribution's choice); when on, the vectorized mixer must
    equal the scalar reference loop bit-for-bit, and differ audibly from
    nearest on fractional-step notes."""
    from audio_formats_tpu.io.source import MemorySource
    from audio_formats_tpu.models.xm import XmDecoder

    # note 47 -> non-integer step at 44.1 kHz
    data = _simple_xm(rows=16, notes=((0, 47),))

    d0 = XmDecoder(MemorySource(data))
    assert d0.linear_interpolation is False
    out_nearest = d0.read(16000)

    d1 = XmDecoder(MemorySource(data))
    d1.linear_interpolation = True
    out_lin = d1.read(16000)
    assert out_lin.shape == out_nearest.shape
    assert np.abs(out_lin - out_nearest).max() > 1e-4

    d2 = XmDecoder(MemorySource(data))
    d2.linear_interpolation = True
    d2._chan_segment = d2._chan_segment_scalar  # force the reference loop
    out_scalar = d2.read(16000)
    # the vectorized mixer computes positions closed-form (p0 + step*i)
    # while the scalar loop accumulates; the 1-ulp position drift moves
    # the lerp weight by ~1e-12, never the sample index in practice
    np.testing.assert_allclose(out_lin, out_scalar, atol=1e-6)

    # config default plumbs through
    from audio_formats_tpu.config import DEFAULT_CODEC_CONFIG
    DEFAULT_CODEC_CONFIG.xm_linear_interpolation = True
    try:
        d3 = XmDecoder(MemorySource(data))
        assert d3.linear_interpolation is True
    finally:
        DEFAULT_CODEC_CONFIG.xm_linear_interpolation = False


def test_envelope_loop_indices_out_of_range():
    """Corrupt sustain/loop point indices (raw u8 in the file) must be
    clamped at load: the reference indexes its fixed 12-slot points
    array unchecked (libxm.d:1987-2008, UB in release builds) — here
    the file must still open and play without raising (fuzz finding)."""
    data = _simple_xm(vol_env={
        "points": [(0, 64), (16, 32), (32, 0)],
        "sustain_on": True, "sustain": 250,
        "loop_on": True, "loop_start": 200, "loop_end": 255,
    }, fadeout=1024)
    s = _open(data)
    out = s.read_samples_float(2000)
    assert np.isfinite(np.asarray(out)).all()


def test_envelope_values_out_of_range_clamped():
    """Envelope point values are u16 in the file but spec-ranged 0..64;
    corrupt values must clamp at load — the reference divides the raw
    value by 64 and feeds the result into sqrt-panning math, which goes
    NaN on corrupt data (libxm.d:2026-2031).  Output must stay finite
    and at unity envelope volume (fuzz finding)."""
    data = _simple_xm(vol_env={
        "points": [(0, 60000), (16, 65535), (32, 64)],
        "sustain_on": False, "loop_on": False,
    }, fadeout=0)
    s = _open(data)
    out = np.asarray(s.read_samples_float(2000))
    assert np.isfinite(out).all()
    assert np.abs(out).max() <= 1.0 + 1e-6
