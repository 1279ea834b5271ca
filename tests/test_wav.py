"""WAV conformance tests: bit-exact decode/encode vs the golden double-math
model, container parsing, the reference seek contract, and error semantics."""

import numpy as np
import pytest

from audio_formats_tpu import (
    AudioFileFormat,
    AudioSampleFormat,
    AudioStream,
    EncodingOptions,
    save_as_wav,
    to_wav,
)
from audio_formats_tpu.ops import pcm

from golden import wav_ref


def _open(data: bytes) -> AudioStream:
    s = AudioStream().open_from_memory(data)
    assert not s.is_error(), s.error_message()
    return s


# ---------------------------------------------------------------------------
# Device kernel bit-exactness
# ---------------------------------------------------------------------------

def test_decode_scale_s16_exhaustive():
    ints = np.arange(-32768, 32768, dtype=np.int32)
    ref = wav_ref.decode_ints_to_f32(ints, 16)
    got = pcm.int_pcm_to_float(ints, "s16")
    np.testing.assert_array_equal(ref, got)


def test_decode_scale_u8_exhaustive():
    ints = np.arange(0, 256, dtype=np.int32)
    ref = wav_ref.decode_ints_to_f32(ints, 8)
    got = pcm.int_pcm_to_float(ints, "u8")
    np.testing.assert_array_equal(ref, got)


def test_decode_scale_s24_sampled(rng):
    ints = rng.integers(-(2**23), 2**23, size=1 << 20).astype(np.int32)
    edge = np.array([-8388608, -8388607, -1, 0, 1, 8388606, 8388607], np.int32)
    ints = np.concatenate([ints, edge])
    ref = wav_ref.decode_ints_to_f32(ints, 24)
    got = pcm.int_pcm_to_float(ints, "s24")
    np.testing.assert_array_equal(ref, got)


def test_decode_scale_s32_sampled(rng):
    ints = rng.integers(-(2**31), 2**31, size=1 << 20).astype(np.int64).astype(np.int32)
    ref = wav_ref.decode_ints_to_f32(ints, 32)
    got = pcm.int_pcm_to_float(ints, "s32")
    np.testing.assert_array_equal(ref, got)


@pytest.mark.parametrize("bits,kind", [(8, "u8"), (16, "s16"), (24, "s24")])
def test_quantize_nodither_exact(rng, bits, kind):
    x = (rng.random(1 << 18, dtype=np.float32) * 2.2 - 1.1).astype(np.float32)
    # include exact representable boundary/tie-prone values
    ints = rng.integers(-(2**bits // 2), 2**bits // 2, size=4096)
    scale = 2.0 ** bits // 2 - 1
    k = rng.integers(0, int(scale), 4096).astype(np.float64)
    # f32 neighbors of the rounding midpoints (k + 0.5) / scale: the exact
    # TwoSum comparison must round these by the TRUE product — a rounded
    # f32 compare flips the 1.5259254723787308e-05-style cases (regression:
    # the pre-fix kernel returned 1 where the real product is 0.4999999995)
    mids = ((k + 0.5) / scale).astype(np.float32)
    x = np.concatenate(
        [x, (ints / (2.0 ** (bits - 1))).astype(np.float32),
         mids, np.nextafter(mids, np.inf), np.nextafter(mids, -np.inf),
         -mids,
         np.array([-1.0, 1.0, 0.0, 0.5, -0.5, 1 - 2**-24,
                   1.5259254723787308e-05], np.float32)]
    )
    ref = wav_ref.quantize_f64(x, bits)
    got = pcm.quantize_float_to_int(x, kind, dither=False)
    np.testing.assert_array_equal(ref, got)


def test_quantize_dither_statistics(rng):
    x = (rng.random(1 << 16, dtype=np.float32) * 1.6 - 0.8).astype(np.float32)
    k = pcm.quantize_float_to_int(x, "s16", dither=True, seed=7)
    err = k.astype(np.float64) - np.clip(x, -1, 1).astype(np.float64) * 32767.0
    # TPDF dither: offset 0.3125 + U[0,0.25] + U[0,0.125] then floor
    assert np.max(np.abs(err)) <= 1.5
    assert abs(np.mean(err)) < 0.01
    # deterministic given a seed
    k2 = pcm.quantize_float_to_int(x, "s16", dither=True, seed=7)
    np.testing.assert_array_equal(k, k2)
    k3 = pcm.quantize_float_to_int(x, "s16", dither=True, seed=8)
    assert not np.array_equal(k, k3)


# ---------------------------------------------------------------------------
# Decode: container + conversion end-to-end
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bits", [8, 16, 24, 32])
@pytest.mark.parametrize("channels", [1, 2, 3])
def test_decode_int_pcm_bit_exact(rng, bits, channels):
    n = 997 * channels
    if bits == 8:
        ints = rng.integers(0, 256, size=n).astype(np.int32)
    else:
        ints = rng.integers(-(2 ** (bits - 1)), 2 ** (bits - 1), size=n).astype(
            np.int32
        )
    data = wav_ref.build_wav(
        wav_ref.pack_pcm(ints, bits), fmt_tag=1, channels=channels,
        sample_rate=44100, bits=bits,
    )
    s = _open(data)
    assert s.get_format() == AudioFileFormat.wav
    assert s.get_num_channels() == channels
    assert s.get_samplerate() == 44100.0
    assert s.get_length_in_frames() == 997
    out = s.read_samples_float(2000)
    assert out.shape == (997, channels)
    ref = wav_ref.decode_ints_to_f32(ints, bits).reshape(997, channels)
    np.testing.assert_array_equal(out, ref)
    # double path matches the f64 divide exactly
    s.seek_position(0)
    out64 = s.read_samples_double(2000)
    ref64 = (ints.astype(np.float64) - (128.0 if bits == 8 else 0.0)) / {
        8: 127.0, 16: 32767.0, 24: 8388607.0, 32: 2147483648.0
    }[bits]
    np.testing.assert_array_equal(out64.reshape(-1), ref64)


@pytest.mark.parametrize("bits", [32, 64])
def test_decode_float_pcm(rng, bits):
    x = (rng.random(500) * 2 - 1).astype(np.float32 if bits == 32 else np.float64)
    raw = x.astype("<f4" if bits == 32 else "<f8").tobytes()
    data = wav_ref.build_wav(raw, fmt_tag=3, channels=1, sample_rate=48000,
                             bits=bits)
    s = _open(data)
    out = s.read_samples_float(500)
    np.testing.assert_array_equal(out.reshape(-1), x.astype(np.float32))


def test_decode_wave_format_extensible(rng):
    ints = rng.integers(-32768, 32768, size=256).astype(np.int32)
    data = wav_ref.build_wav(
        wav_ref.pack_pcm(ints, 16), fmt_tag=1, channels=2, sample_rate=44100,
        bits=16, extensible=True,
    )
    s = _open(data)
    out = s.read_samples_float(128)
    ref = wav_ref.decode_ints_to_f32(ints, 16).reshape(128, 2)
    np.testing.assert_array_equal(out, ref)


def test_decode_skips_unknown_chunks_and_trailing_zero(rng):
    ints = rng.integers(-32768, 32768, size=64).astype(np.int32)
    data = wav_ref.build_wav(
        wav_ref.pack_pcm(ints, 16), fmt_tag=1, channels=1, sample_rate=8000,
        bits=16, extra_chunks=[(b"LIST", b"\x00" * 11), (b"AFAn", b"xyz")],
    )
    # corrupted trailing zero byte tolerance (wav.d:81-91)
    s = _open(data + b"\0")
    out = s.read_samples_float(64)
    assert out.shape == (64, 1)


def test_chunked_equals_whole(rng):
    ints = rng.integers(-32768, 32768, size=3001 * 2).astype(np.int32)
    data = wav_ref.build_wav(wav_ref.pack_pcm(ints, 16), fmt_tag=1,
                             channels=2, sample_rate=44100, bits=16)
    whole = _open(data).read_samples_float(10000)
    s = _open(data)
    parts = []
    while True:
        c = s.read_samples_float(257)
        if c.shape[0] == 0:
            break
        parts.append(c)
    assert not s.is_error()
    np.testing.assert_array_equal(np.concatenate(parts), whole)


# ---------------------------------------------------------------------------
# Seek contract (examples/transcode/source/main.d:90-162)
# ---------------------------------------------------------------------------

def test_seek_contract(rng):
    frames = 500
    ints = rng.integers(-32768, 32768, size=frames).astype(np.int32)
    data = wav_ref.build_wav(wav_ref.pack_pcm(ints, 16), fmt_tag=1,
                             channels=1, sample_rate=44100, bits=16)
    s = _open(data)
    L = s.get_length_in_frames()
    assert L == frames
    assert s.tell_position() == 0            # tell==0 after open
    assert s.seek_position(0)                # seek(0) legal
    assert not s.seek_position(-1)           # before 0: rejected no-op
    assert s.tell_position() == 0
    assert not s.seek_position(L + 1)        # past end: rejected no-op
    assert s.tell_position() == 0
    assert s.seek_position(L // 2)
    assert s.tell_position() == L // 2
    assert s.seek_position(L - 1)            # end-1 -> exactly 1 frame left
    assert s.read_samples_float(100).shape[0] == 1
    assert s.seek_position(L)                # end -> 0 frames left
    assert s.read_samples_float(100).shape[0] == 0
    assert not s.is_error()
    assert s.seek_position(0)                # re-seek re-reads
    again = s.read_samples_float(16)
    ref = wav_ref.decode_ints_to_f32(ints[:16], 16).reshape(16, 1)
    np.testing.assert_array_equal(again, ref)


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("fmt,bits", [
    (AudioSampleFormat.s8, 8),
    (AudioSampleFormat.s16, 16),
    (AudioSampleFormat.s24, 24),
])
def test_encode_nodither_bit_exact(rng, fmt, bits):
    x = (rng.random(1501 * 2, dtype=np.float32) * 2 - 1).astype(np.float32)
    opts = EncodingOptions(sample_format=fmt, enable_dither=False)
    out = to_wav(x.reshape(-1, 2), 44100, options=opts)
    tag, ch, rate, pbits, raw = wav_ref.parse_wav(out)
    assert (tag, ch, rate, pbits) == (1, 2, 44100, bits)
    got = wav_ref.unpack_pcm(raw, bits)
    if bits == 8:
        got = got - 128
    ref = wav_ref.quantize_f64(x, bits)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("fmt,bits,npdt", [
    (AudioSampleFormat.fp32, 32, "<f4"),
    (AudioSampleFormat.fp64, 64, "<f8"),
])
def test_encode_float_passthrough(rng, fmt, bits, npdt):
    x = (rng.random(800, dtype=np.float32) * 2 - 1).astype(np.float32)
    opts = EncodingOptions(sample_format=fmt, enable_dither=False)
    out = to_wav(x, 48000, options=opts)
    tag, ch, rate, pbits, raw = wav_ref.parse_wav(out)
    assert (tag, ch, rate, pbits) == (3, 1, 48000, bits)
    np.testing.assert_array_equal(
        np.frombuffer(raw, npdt).astype(np.float32), x
    )


def test_encode_riff_sizes_backpatched(rng):
    x = (rng.random(100, dtype=np.float32) * 2 - 1)
    out = to_wav(x, 22050,
                 options=EncodingOptions(sample_format=AudioSampleFormat.s16,
                                         enable_dither=False))
    import struct
    riff_size = struct.unpack_from("<I", out, 4)[0]
    assert riff_size == len(out) - 8
    tag, ch, rate, bits, raw = wav_ref.parse_wav(out)
    assert len(raw) == 200


def test_save_as_wav_roundtrip(tmp_path, rng):
    x = (rng.random((321, 2), dtype=np.float32) * 2 - 1)
    p = tmp_path / "out.wav"
    save_as_wav(x, p, 44100,
                options=EncodingOptions(sample_format=AudioSampleFormat.s16,
                                        enable_dither=False))
    s = AudioStream().open_from_file(str(p))
    assert not s.is_error(), s.error_message()
    y = s.read_samples_float(1000)
    ref = wav_ref.decode_ints_to_f32(wav_ref.quantize_f64(x.reshape(-1), 16), 16)
    np.testing.assert_array_equal(y.reshape(-1), ref)


def test_transcode_roundtrip_chunked(rng):
    """decode -> encode s24 -> decode: the reference transcode loop shape."""
    ints = rng.integers(-32768, 32768, size=2048).astype(np.int32)
    src = wav_ref.build_wav(wav_ref.pack_pcm(ints, 16), fmt_tag=1, channels=1,
                            sample_rate=44100, bits=16)
    sin = _open(src)
    sout = AudioStream().open_to_buffer(
        AudioFileFormat.wav, 44100, 1,
        EncodingOptions(sample_format=AudioSampleFormat.s24,
                        enable_dither=False))
    while True:
        c = sin.read_samples_float(1024)
        if c.shape[0] == 0:
            break
        sout.write_samples_float(c)
    enc = sout.finalize_and_get_encoded_result()
    assert enc is not None
    _, _, _, bits, raw = wav_ref.parse_wav(enc)
    got = wav_ref.unpack_pcm(raw, 24)
    ref = wav_ref.quantize_f64(wav_ref.decode_ints_to_f32(ints, 16), 24)
    np.testing.assert_array_equal(got, ref)


# ---------------------------------------------------------------------------
# Error model
# ---------------------------------------------------------------------------

def test_unknown_format_error():
    s = AudioStream().open_from_memory(b"this is not audio at all" * 4)
    assert s.is_error()
    assert s.error_message() == "Cannot decode stream: unrecognized encoding."
    assert s.read_samples_float(100).shape[0] == 0


def test_uninitialized_stream_is_error():
    s = AudioStream()
    assert s.is_error()
    assert s.error_message() == "Stream not initialized"
    assert not s.seek_position(0)


def test_truncated_wav_errors():
    s = AudioStream().open_from_memory(b"RIFF\x04\x00\x00\x00WAVE")
    assert s.is_error()


def test_memory_vs_file_symmetry(tmp_path, rng):
    ints = rng.integers(-32768, 32768, size=640).astype(np.int32)
    data = wav_ref.build_wav(wav_ref.pack_pcm(ints, 16), fmt_tag=1,
                             channels=2, sample_rate=44100, bits=16)
    p = tmp_path / "t.wav"
    p.write_bytes(data)
    a = AudioStream().open_from_file(str(p)).read_samples_float(1000)
    b = AudioStream().open_from_memory(data).read_samples_float(1000)
    np.testing.assert_array_equal(a, b)


def test_open_with_callbacks(rng):
    ints = rng.integers(-32768, 32768, size=64).astype(np.int32)
    data = wav_ref.build_wav(wav_ref.pack_pcm(ints, 16), fmt_tag=1,
                             channels=1, sample_rate=44100, bits=16)
    import io
    f = io.BytesIO(data)
    s = AudioStream().open_with_callbacks(read=f.read, seek=f.seek)
    assert not s.is_error()
    out = s.read_samples_float(64)
    ref = wav_ref.decode_ints_to_f32(ints, 16).reshape(64, 1)
    np.testing.assert_array_equal(out, ref)


def test_odd_sized_final_data_chunk():
    """A WAV whose final data chunk has an odd byte size and no pad byte
    (legal; e.g. 24-bit mono with an odd frame count) must decode."""
    x = (0.25 * np.sin(2 * np.pi * 440 * np.arange(2001) / 44100))[:, None]
    enc = AudioStream().open_to_buffer(
        AudioFileFormat.wav, 44100.0, 1,
        EncodingOptions(sample_format=AudioSampleFormat.s24))
    enc.write_samples_float(x.astype(np.float32))
    data = enc.finalize_and_get_encoded_result()
    assert (len(data) & 1) == 1  # odd total: 2001*3 data bytes
    s = AudioStream()
    s.open_from_memory(data)
    assert not s.is_error(), s.error_message()
    y = s.read_samples_float(3000)
    assert y.shape == (2001, 1)
    assert np.abs(y - x).max() < 2e-4
