"""ProTracker MOD engine tests: probing, module API, pitch accuracy,
effects, loop-stop, and chunk invariance."""

import numpy as np

from audio_formats_tpu import AudioFileFormat, AudioStream

from golden import mod_ref


def _simple_mod(periods=(428,), volume=64, effect=0, param=0, n_orders=1):
    pat = mod_ref.empty_pattern()
    for i, p in enumerate(periods):
        pat[i * 4][0] = mod_ref.cell(sample=1, period=p, effect=effect,
                                     param=param)
    # looped saw so the tone sustains
    samples = [(mod_ref.saw_sample(64), volume, 0, 0, 64)]
    return mod_ref.build_mod([pat], list(range(1)) * n_orders or [0], samples)


def _open(data):
    s = AudioStream().open_from_memory(data)
    assert not s.is_error(), s.error_message()
    assert s.get_format() == AudioFileFormat.mod
    return s


def test_probe_and_metadata():
    s = _open(_simple_mod())
    assert s.get_samplerate() == 44100.0
    assert s.get_num_channels() == 2
    assert s.get_length_in_frames() == -1  # unknown length (stream.d:1822)
    assert s.is_module()
    assert s.count_module_patterns() == 1
    assert s.get_module_length() == 1
    assert s.rows_in_pattern(0) == 64


def test_renders_finite_and_stops_after_loop():
    s = _open(_simple_mod())
    total = 0
    while True:
        c = s.read_samples_float(44100)
        if c.shape[0] == 0:
            break
        total += c.shape[0]
        assert total < 44100 * 60, "did not stop after one loop"
    # one pattern at speed 6 / 125 BPM: 64 lines * 6 ticks * 882 samples
    assert abs(total - 64 * 6 * 882) < 2000
    assert not s.is_error()


def test_pitch_of_rendered_tone():
    # C-2 period 428 with a 64-sample looped saw:
    # rate = 3546894.6 / (428 * 44100) * 44100 / 64 Hz
    s = _open(_simple_mod(periods=(428,)))
    y = s.read_samples_float(44100)[:, 0]
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    peak = np.argmax(spec[10:]) + 10
    freq = peak * 44100 / len(y)
    expect = 3546894.6 / 428 / 64
    assert abs(freq - expect) / expect < 0.02, (freq, expect)


def test_volume_effect():
    loud = _open(_simple_mod(effect=0xC, param=0x40)).read_samples_float(20000)
    quiet = _open(_simple_mod(effect=0xC, param=0x10)).read_samples_float(20000)
    assert np.abs(quiet).max() < np.abs(loud).max() * 0.5


def test_speed_effect_changes_pattern_duration():
    fast = _open(_simple_mod(effect=0xF, param=3))
    total = 0
    while True:
        c = fast.read_samples_float(44100)
        if c.shape[0] == 0:
            break
        total += c.shape[0]
    assert abs(total - 64 * 3 * 882) < 3000, total


def test_chunked_equals_whole():
    whole = _open(_simple_mod(periods=(428, 381, 320))).read_samples_float(
        10**6
    )
    s = _open(_simple_mod(periods=(428, 381, 320)))
    parts = []
    while True:
        c = s.read_samples_float(777)
        if c.shape[0] == 0:
            break
        parts.append(c)
    np.testing.assert_array_equal(np.concatenate(parts), whole)


def test_pattern_row_tracking_and_remaining():
    s = _open(_simple_mod())
    dec = s._decoder
    rem0 = s.frames_remaining_in_pattern()
    assert abs(rem0 - 64 * 6 * 882) <= 64 * 6 * 882 * 0.02
    s.read_samples_float(6 * 882 * 4)  # ~4 lines
    assert s.tell_module_row() >= 3
    assert s.tell_module_pattern() == 0
    assert s.frames_remaining_in_pattern() < rem0


def test_seek_pattern_row():
    s = _open(_simple_mod())
    assert s.seek_position(0, 32)
    s.read_samples_float(6 * 882 * 2)
    assert s.tell_module_row() >= 32
    # frame-based seek is rejected for modules (stream.d:1097 assert)
    assert not s.seek_position(100)


def test_not_a_mod_rejected():
    s = AudioStream().open_from_memory(bytes(range(256)) * 10)
    assert s.is_error()


def test_tell_position_tracks_module_playback():
    """The reference ASSERTS !isModule() in tellPosition (stream.d:1209);
    here modules report frames emitted since open / last seek instead."""
    s = _open(_simple_mod(periods=(428, 320), n_orders=2))
    assert s.tell_position() == 0
    a = s.read_samples_float(1000)
    assert s.tell_position() == len(a) == 1000
    b = s.read_samples_float(500)
    assert s.tell_position() == 1000 + len(b)
    assert s.seek_position(0, 0)
    assert s.tell_position() == 0
    c = s.read_samples_float(64)
    assert s.tell_position() == len(c)


def test_af_linear_resampling_switch():
    """AF_LINEAR parity (pocketmod.d:694-700): nearest by default; the
    linear mix must equal a direct lerp of the sample data at the mixer's
    positions and differ from nearest on fractional increments."""
    from audio_formats_tpu.io.source import MemorySource
    from audio_formats_tpu.models.mod import ModDecoder

    pat = mod_ref.empty_pattern()
    pat[0][0] = mod_ref.cell(sample=1, period=428, effect=0, param=0)
    data = mod_ref.build_mod(
        [pat], [0], [(mod_ref.saw_sample(64), 64, 0, 0, 64)])

    d0 = ModDecoder(MemorySource(data))
    assert d0.linear_resampling is False
    out_nearest = d0.read(8000)

    d1 = ModDecoder(MemorySource(data))
    d1.linear_resampling = True
    out_lin = d1.read(8000)
    assert out_lin.shape == out_nearest.shape
    assert np.abs(out_lin - out_nearest).max() > 1e-6

    from audio_formats_tpu.config import DEFAULT_CODEC_CONFIG
    DEFAULT_CODEC_CONFIG.mod_linear_resampling = True
    try:
        d2 = ModDecoder(MemorySource(data))
        assert d2.linear_resampling is True
        out2 = d2.read(8000)
        np.testing.assert_array_equal(out2, out_lin)
    finally:
        DEFAULT_CODEC_CONFIG.mod_linear_resampling = False
