"""Native (C) Opus stages vs the Python reference paths.

The C mirrors (af_host.cc: af_celt_decode_symbols, af_celt_finish_channel,
af_silk_synth, af_silk_excitation, af_silk_lsf2lpc) must be bit-identical
to models/celt.py + models/silk.py on every packet: the Python paths are
the validated reference (libopus range fingerprints + PCM tolerance), so
any deviation in the native path is a bug, not a tolerance question.
"""

import os

import numpy as np
import pytest

from audio_formats_tpu.host import native
from audio_formats_tpu.models.celt import CeltDecoder
from audio_formats_tpu.models.opus import RangeDecoder, parse_packet

from golden import opus_oracle, opus_ref


def _have_oracle():
    try:
        return opus_oracle.get_lib() is not None
    except Exception:
        return False


needs_oracle = pytest.mark.skipif(not _have_oracle(),
                                  reason="system libopus unavailable")
needs_native = pytest.mark.skipif(native.get_lib() is None,
                                  reason="native library unavailable")


def _ab_decode_celt(pkts, channels):
    """Decode CELT packets through both paths; return (native, python)."""
    outs = []
    for no_nat in (False, True):
        if no_nat:
            os.environ["AF_TPU_NO_NATIVE"] = "1"
        else:
            os.environ.pop("AF_TPU_NO_NATIVE", None)
        try:
            dec = CeltDecoder(output_channels=channels)
            res = []
            for pkt in pkts:
                info = parse_packet(pkt)
                for fr in info["frames"]:
                    rd = RangeDecoder(fr)
                    res.append(dec.decode_frame(
                        rd, 2 if info["stereo"] else 1,
                        info["frame_size"], 0, 21))
        finally:
            os.environ.pop("AF_TPU_NO_NATIVE", None)
        outs.append(np.concatenate(res))
    return outs


@needs_native
@needs_oracle
@pytest.mark.parametrize("channels,dur_ctl,N,bitrate", [
    (1, 5001, 120, 48000),
    (1, 5004, 960, 128000),
    (2, 5002, 240, 64000),
    (2, 5004, 960, 192000),
])
def test_native_celt_bit_identical(channels, dur_ctl, N, bitrate):
    import ctypes

    O = opus_oracle
    rng = np.random.default_rng(3)
    npkt = 12
    n = N * npkt
    t = np.arange(n) / 48000.0
    sig = (8000 * np.sin(2 * np.pi * 440 * t) +
           6000 * np.sin(2 * np.pi * 3517 * t) +
           2000 * rng.standard_normal(n))
    # impulses force transient frames + anti-collapse paths
    sig[:: N // 2] += 20000
    sig = np.clip(sig, -32768, 32767).astype(np.int16)
    sig = np.repeat(sig[:, None], channels, 1)
    enc = O.OracleEncoder(48000, channels, bitrate=bitrate,
                          signal=O.OPUS_SIGNAL_MUSIC,
                          bandwidth=O.OPUS_BANDWIDTH_FULLBAND)
    enc._lib.opus_encoder_ctl(ctypes.c_void_p(enc._enc), 4040, dur_ctl)
    pkts = [enc.encode(sig[i * N : (i + 1) * N]) for i in range(npkt)]
    a, b = _ab_decode_celt(pkts, channels)
    assert a.shape == b.shape
    assert np.array_equal(a, b), float(np.abs(a - b).max())


@needs_native
@needs_oracle
def test_native_celt_hybrid_stream_bit_identical():
    """Hybrid packets enter the C stage mid-stream (after SILK on the same
    range decoder) and Python continues on the synced-back rd; the full
    stream decode must be bit-identical either way."""
    import audio_formats_tpu as af

    O = opus_oracle
    rng = np.random.default_rng(5)
    N = 960
    n = N * 8
    t = np.arange(n) / 48000.0
    sig = np.clip(6000 * np.sin(2 * np.pi * 220 * t) *
                  (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t)) +
                  600 * rng.standard_normal(n),
                  -32000, 32000).astype(np.int16)[:, None]
    enc = O.OracleEncoder(48000, 1, bitrate=36000,
                          application=O.OPUS_APPLICATION_VOIP,
                          signal=O.OPUS_SIGNAL_VOICE,
                          bandwidth=O.OPUS_BANDWIDTH_FULLBAND)
    pkts = [(enc.encode(sig[i * N : (i + 1) * N]), N) for i in range(8)]
    cfgs = {parse_packet(p)["config"] for p, _ in pkts}
    assert cfgs <= set(range(12, 16)), cfgs  # hybrid configs only
    data = opus_ref.build_ogg_opus(pkts, channels=1, preskip=0)

    outs = []
    for no_nat in (False, True):
        if no_nat:
            os.environ["AF_TPU_NO_NATIVE"] = "1"
        else:
            os.environ.pop("AF_TPU_NO_NATIVE", None)
        try:
            st = af.AudioStream()
            st.open_from_memory(data)
            outs.append(st.read_samples_float(st.get_length_in_frames()))
        finally:
            os.environ.pop("AF_TPU_NO_NATIVE", None)
    a, b = outs
    assert a.shape == b.shape
    assert np.array_equal(a, b), float(np.abs(a - b).max())


@needs_native
@needs_oracle
@pytest.mark.parametrize("bw_name,bitrate,channels,N", [
    ("narrowband", 12000, 1, 960),
    ("mediumband", 16000, 2, 960),
    ("wideband", 24000, 1, 480),
    ("wideband", 32000, 2, 960),
])
def test_native_silk_stream_bit_identical(bw_name, bitrate, channels, N):
    """SILK voice streams: C excitation + LSF->LPC + synthesis must match
    the Python path bit-for-bit through the full public decode."""
    import audio_formats_tpu as af

    O = opus_oracle
    bw = {"narrowband": O.OPUS_BANDWIDTH_NARROWBAND,
          "mediumband": O.OPUS_BANDWIDTH_MEDIUMBAND,
          "wideband": O.OPUS_BANDWIDTH_WIDEBAND}[bw_name]
    rng = np.random.default_rng(9)
    npkt = 48000 // N * 2
    n = N * npkt
    t = np.arange(n) / 48000.0
    sig = np.clip(6000 * np.sin(2 * np.pi * 220 * t) *
                  (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t)) +
                  600 * rng.standard_normal(n),
                  -32000, 32000).astype(np.int16)
    sig = np.repeat(sig[:, None], channels, 1)
    if channels == 2:
        sig[:, 1] = np.roll(sig[:, 1], 17)
    enc = O.OracleEncoder(48000, channels, bitrate=bitrate,
                          application=O.OPUS_APPLICATION_VOIP,
                          signal=O.OPUS_SIGNAL_VOICE, bandwidth=bw)
    pkts = [(enc.encode(sig[i * N : (i + 1) * N]), N) for i in range(npkt)]
    data = opus_ref.build_ogg_opus(pkts, channels=channels, preskip=0)

    outs = []
    for no_nat in (False, True):
        if no_nat:
            os.environ["AF_TPU_NO_NATIVE"] = "1"
        else:
            os.environ.pop("AF_TPU_NO_NATIVE", None)
        try:
            st = af.AudioStream()
            st.open_from_memory(data)
            outs.append(st.read_samples_float(st.get_length_in_frames()))
        finally:
            os.environ.pop("AF_TPU_NO_NATIVE", None)
    a, b = outs
    assert a.shape == b.shape
    assert np.array_equal(a, b), float(np.abs(a - b).max())


@needs_native
def test_native_vorbis_residue_bit_identical():
    """Vorbis residue decode through the packed codebook bank must match
    the Python codebook path bit-for-bit at the public decode surface."""
    import audio_formats_tpu as af
    from golden import vorbis_oracle as VO
    from audio_formats_tpu.io import ogg as oggmod

    try:
        if VO.get_libs() is None:
            pytest.skip("libvorbis unavailable")
    except Exception:
        pytest.skip("libvorbis unavailable")
    rng = np.random.default_rng(2)
    n = 44100 * 3
    t = np.arange(n) / 44100
    pcm = (0.3 * np.sin(2 * np.pi * 440 * t) +
           0.05 * rng.standard_normal(n)).astype(np.float32)
    pcm = np.stack([pcm, np.roll(pcm, 9)], 1)
    hdrs, apkts = VO.encode(np.ascontiguousarray(pcm), 44100, quality=0.4)
    pages = [oggmod.build_page([hdrs[0]], 1, 0, 0, bos=True),
             oggmod.build_page(list(hdrs[1:]), 1, 1, 0)]
    for i, (p, g) in enumerate(apkts):
        pages.append(
            oggmod.build_page([p], 1, 2 + i, g, eos=(i == len(apkts) - 1)))
    data = b"".join(pages)

    outs = []
    for no_nat in (False, True):
        if no_nat:
            os.environ["AF_TPU_NO_NATIVE"] = "1"
        else:
            os.environ.pop("AF_TPU_NO_NATIVE", None)
        try:
            st = af.AudioStream()
            st.open_from_memory(data)
            outs.append(st.read_samples_float(st.get_length_in_frames()))
        finally:
            os.environ.pop("AF_TPU_NO_NATIVE", None)
    a, b = outs
    assert a.shape == b.shape
    assert np.array_equal(a, b), float(np.abs(a - b).max())
