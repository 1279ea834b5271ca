"""Batched encoders (parallel/encode.py) must be byte-exact vs the
streaming single-stream encoders for every lane, including ragged lengths,
mixed channel counts, short final frames, and dithered WAV output."""

import numpy as np

from audio_formats_tpu import AudioStream
from audio_formats_tpu.config import (AudioFileFormat, AudioSampleFormat,
                                      EncodingOptions)
from audio_formats_tpu.io.source import ByteSink
from audio_formats_tpu.models.qoa import QoaEncoder
from audio_formats_tpu.models.wav import WavEncoder
from audio_formats_tpu.parallel.encode import (encode_qoa_batch,
                                               encode_wav_batch)


def _sig(rng, n, ch, f0=330.0, amp=0.35):
    t = np.arange(n)[:, None]
    mults = (np.arange(ch) * 0.37 + 1.0)[None, :]
    return (amp * np.sin(2 * np.pi * f0 * t * mults / 44100.0)
            + 0.01 * rng.standard_normal((n, ch))).astype(np.float32)


def _qoa_single(pcm, sr):
    sink = ByteSink()
    enc = QoaEncoder(sink, sr, pcm.shape[1], EncodingOptions())
    enc.write(pcm)
    enc.finalize()
    return sink.getvalue()


def test_qoa_batch_encode_byte_exact(rng):
    pcms = [
        _sig(rng, 5120 * 2, 1),            # exact full frames
        _sig(rng, 5120 * 2 + 1234, 2),     # short final frame, stereo
        _sig(rng, 800, 1),                 # shorter than one frame
        _sig(rng, 5120 * 3 + 20, 2),       # ragged long
    ]
    batch = encode_qoa_batch(pcms, 44100, parallel_frames=False)
    for pcm, got in zip(pcms, batch):
        ref = _qoa_single(pcm, 44100)
        assert got == ref
        # and it round-trips through the decoder
        s = AudioStream().open_from_memory(got)
        assert s.get_format() == AudioFileFormat.qoa
        out = s.read_samples_float(10 ** 6)
        assert out.shape[0] == pcm.shape[0]


def test_qoa_frame_parallel_encode(rng):
    """parallel_frames=True: every frame is an independent lane.  The
    stream must still decode to the right shape with near-sequential
    quality (each frame header carries its own LMS start state,
    qoa.d:315-326), and the FIRST frame must be byte-identical to the
    sequential encoder (both start from the initial LMS state)."""
    pcms = [
        _sig(rng, 5120 * 2, 1),
        _sig(rng, 5120 * 2 + 1234, 2),
        _sig(rng, 800, 1),
        _sig(rng, 5120 * 3 + 20, 2),
    ]
    seq = encode_qoa_batch(pcms, 44100, parallel_frames=False)
    par = encode_qoa_batch(pcms, 44100, parallel_frames=True)
    for pcm, s, p in zip(pcms, seq, par):
        ch = pcm.shape[1]
        fl = min(5120, pcm.shape[0])
        nsl = (fl + 19) // 20
        f_size = 8 + 16 * ch + 8 * nsl * ch
        assert p[:8] == s[:8]                      # file header
        assert p[8:8 + f_size] == s[8:8 + f_size]  # first frame
        assert len(p) == len(s)                    # same framing
        out = AudioStream().open_from_memory(p).read_samples_float(10 ** 7)
        assert out.shape == pcm.shape
        snr_p = _snr(pcm, out)
        snr_s = _snr(pcm, AudioStream().open_from_memory(s)
                     .read_samples_float(10 ** 7))
        assert snr_p > 25.0
        assert snr_p > snr_s - 4.0  # re-convergence cost is small


def _snr(ref, got):
    err = got - ref
    return 10 * np.log10(np.mean(ref ** 2) / max(np.mean(err ** 2), 1e-12))


def _wav_single(pcm, sr, options):
    sink = ByteSink()
    enc = WavEncoder(sink, sr, pcm.shape[1], options)
    enc.write(pcm)
    enc.finalize()
    return sink.getvalue()


def test_wav_batch_encode_byte_exact(rng):
    for fmt, dither in ((AudioSampleFormat.s16, True),
                        (AudioSampleFormat.s16, False),
                        (AudioSampleFormat.s24, True),
                        (AudioSampleFormat.fp32, False)):
        options = EncodingOptions(sample_format=fmt, enable_dither=dither)
        pcms = [_sig(rng, 3000, 1), _sig(rng, 4777, 2), _sig(rng, 100, 1)]
        batch = encode_wav_batch(pcms, 44100, options)
        for pcm, got in zip(pcms, batch):
            assert got == _wav_single(pcm, 44100, options), (fmt, dither)
