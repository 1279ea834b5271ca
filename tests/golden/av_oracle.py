"""FFmpeg (libavcodec) decode oracle — test-only accuracy anchor.

The reference's MP3/FLAC/Vorbis codecs are D translations of public C
decoders (minimp3.d:1-20, drflac.d:1-110, stb_vorbis2.d:1-90).  Those C
originals can't be vendored here (no network), so the system libavcodec —
an independent, widely-validated C decoder lineage — anchors MP3 (<=1e-4)
and FLAC (bit-exact) the same way libopus/libvorbis already anchor
Opus/Vorbis.  See BASELINE.md's first milestone.

Build the shim once with tools/build_av_oracle.sh; ``decode`` returns
(float_pcm [frames, ch], int_pcm or None, sample_rate, int_bits).
"""
import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def get_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "_av_oracle.so")
    if not os.path.exists(path):
        # build on demand when the toolchain+ffmpeg exist (CI image does)
        import subprocess
        sh = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "..", "..", "tools", "build_av_oracle.sh")
        try:
            subprocess.run(["sh", sh], check=True, capture_output=True,
                           timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.av_oracle_decode.restype = ctypes.c_int
    lib.av_oracle_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_longlong,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.c_longlong),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_char_p, ctypes.c_int,
    ]
    lib.av_oracle_free.restype = None
    lib.av_oracle_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def decode(data: bytes):
    """Decode a whole in-memory stream via libavcodec.

    Returns (f32 [frames, ch], int32 [frames, ch] or None, sr, int_bits).
    Raises RuntimeError on decode failure, OSError when the oracle shim
    is unavailable (caller should skip).
    """
    lib = get_lib()
    if lib is None:
        raise OSError("av oracle unavailable")
    out_f = ctypes.POINTER(ctypes.c_float)()
    out_i = ctypes.POINTER(ctypes.c_int32)()
    nfr = ctypes.c_longlong()
    nch = ctypes.c_int()
    sr = ctypes.c_int()
    bits = ctypes.c_int()
    err = ctypes.create_string_buffer(256)
    rc = lib.av_oracle_decode(
        data, len(data), ctypes.byref(out_f), ctypes.byref(out_i),
        ctypes.byref(nfr), ctypes.byref(nch), ctypes.byref(sr),
        ctypes.byref(bits), err, len(err))
    if rc != 0:
        raise RuntimeError(f"av oracle: {err.value.decode()}")
    try:
        n = nfr.value * nch.value
        f = np.ctypeslib.as_array(out_f, shape=(n,)).reshape(
            nfr.value, nch.value).copy()
        iv = None
        if bits.value:
            iv = np.ctypeslib.as_array(out_i, shape=(n,)).reshape(
                nfr.value, nch.value).copy()
    finally:
        lib.av_oracle_free(out_f)
        if bits.value:
            lib.av_oracle_free(out_i)
    return f, iv, sr.value, bits.value
