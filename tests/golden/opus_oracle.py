"""ctypes bindings to the system libopus — used ONLY by tests, as an
encoder for fixture generation and as a decode oracle.

The framework itself never links libopus; these bindings exist so the
from-spec decoder in ``audio_formats_tpu.models.opus`` can be validated
against ground truth (reference parity contract: <=1e-4 max-abs PCM,
SURVEY.md §4).  Tests skip if the library is absent.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

OPUS_APPLICATION_AUDIO = 2049
OPUS_APPLICATION_VOIP = 2048
OPUS_SET_BITRATE = 4002
OPUS_SET_COMPLEXITY = 4010
OPUS_SET_FORCE_CHANNELS = 4022
OPUS_SET_SIGNAL = 4024
OPUS_SET_VBR = 4006
OPUS_SET_BANDWIDTH = 4008
OPUS_AUTO = -1000
OPUS_SIGNAL_MUSIC = 3002
OPUS_SIGNAL_VOICE = 3001
OPUS_BANDWIDTH_NARROWBAND = 1101
OPUS_BANDWIDTH_MEDIUMBAND = 1102
OPUS_BANDWIDTH_WIDEBAND = 1103
OPUS_BANDWIDTH_SUPERWIDEBAND = 1104
OPUS_BANDWIDTH_FULLBAND = 1105

_lib = None


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    for name in ("libopus.so.0", "libopus.so", ctypes.util.find_library("opus")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
            break
        except OSError:
            continue
    else:
        return None
    lib.opus_encoder_create.restype = ctypes.c_void_p
    lib.opus_encoder_create.argtypes = [
        ctypes.c_int32, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.opus_encode.restype = ctypes.c_int32
    lib.opus_encode.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int16), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
    ]
    lib.opus_decoder_create.restype = ctypes.c_void_p
    lib.opus_decoder_create.argtypes = [
        ctypes.c_int32, ctypes.c_int, ctypes.POINTER(ctypes.c_int)
    ]
    lib.opus_decode_float.restype = ctypes.c_int
    lib.opus_decode_float.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
    ]
    _lib = lib
    return _lib


class OracleEncoder:
    """Real libopus encoder; produces packets for fixture streams."""

    def __init__(self, sample_rate=48000, channels=1, bitrate=64000,
                 application=OPUS_APPLICATION_AUDIO, signal=None,
                 bandwidth=None, vbr=None, complexity=None):
        lib = get_lib()
        assert lib is not None
        err = ctypes.c_int(0)
        self._lib = lib
        self._enc = lib.opus_encoder_create(
            sample_rate, channels, application, ctypes.byref(err)
        )
        assert err.value == 0, f"opus_encoder_create: {err.value}"
        self.channels = channels
        lib.opus_encoder_ctl(
            ctypes.c_void_p(self._enc), OPUS_SET_BITRATE, bitrate
        )
        if signal is not None:
            lib.opus_encoder_ctl(
                ctypes.c_void_p(self._enc), OPUS_SET_SIGNAL, signal
            )
        if bandwidth is not None:
            lib.opus_encoder_ctl(
                ctypes.c_void_p(self._enc), OPUS_SET_BANDWIDTH, bandwidth
            )
        if vbr is not None:
            lib.opus_encoder_ctl(
                ctypes.c_void_p(self._enc), OPUS_SET_VBR, int(vbr)
            )
        if complexity is not None:
            lib.opus_encoder_ctl(
                ctypes.c_void_p(self._enc), OPUS_SET_COMPLEXITY, complexity
            )

    def encode(self, pcm_s16: np.ndarray) -> bytes:
        """pcm_s16: [frames, channels] int16; frames must be a legal Opus
        frame size (120/240/480/960/1920/2880 at 48 kHz)."""
        pcm = np.ascontiguousarray(pcm_s16, dtype=np.int16)
        out = np.zeros(4000, np.uint8)
        n = self._lib.opus_encode(
            ctypes.c_void_p(self._enc),
            pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            pcm.shape[0],
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            out.size,
        )
        assert n > 0, f"opus_encode: {n}"
        return bytes(out[:n])


class OracleDecoder:
    """Real libopus decoder; ground truth for PCM comparison."""

    def __init__(self, sample_rate=48000, channels=1):
        lib = get_lib()
        assert lib is not None
        err = ctypes.c_int(0)
        self._lib = lib
        self._dec = lib.opus_decoder_create(
            sample_rate, channels, ctypes.byref(err)
        )
        assert err.value == 0
        self.channels = channels

    def decode(self, packet: bytes, max_frames=5760) -> np.ndarray:
        out = np.zeros(max_frames * self.channels, np.float32)
        buf = (ctypes.c_uint8 * len(packet)).from_buffer_copy(packet)
        n = self._lib.opus_decode_float(
            ctypes.c_void_p(self._dec),
            ctypes.cast(buf, ctypes.POINTER(ctypes.c_uint8)), len(packet),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_frames, 0,
        )
        assert n > 0, f"opus_decode_float: {n}"
        return out[: n * self.channels].reshape(n, self.channels)
