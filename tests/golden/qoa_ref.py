"""Golden QOA model — scalar pure-Python encoder/decoder implementing the QOA
spec (qoaformat.org) exactly as the reference does (qoa.d), used to verify
the framework's device kernels.  Deliberately shares no code with
audio_formats_tpu: plain Python ints, explicit 32-bit wraparound.
"""

from __future__ import annotations

import numpy as np

SLICE_LEN = 20
SLICES_PER_FRAME = 256
FRAME_LEN = SLICE_LEN * SLICES_PER_FRAME
LMS_LEN = 4
MAGIC = 0x716F6166

QUANT_TAB = [7, 7, 7, 5, 5, 3, 3, 1, 0, 0, 2, 2, 4, 4, 6, 6, 6]
SCALEFACTOR_TAB = [1, 7, 21, 45, 84, 138, 211, 304, 421, 562, 731, 928,
                   1157, 1419, 1715, 2048]
RECIPROCAL_TAB = [65536, 9363, 3121, 1457, 781, 475, 311, 216, 156, 117, 90,
                  71, 57, 47, 39, 32]
# Literal table from the spec (also qoa.d:197-215) — cross-checks any derived
# version used by the implementation.
DEQUANT_TAB = [
    [1, -1, 3, -3, 5, -5, 7, -7],
    [5, -5, 18, -18, 32, -32, 49, -49],
    [16, -16, 53, -53, 95, -95, 147, -147],
    [34, -34, 113, -113, 203, -203, 315, -315],
    [63, -63, 210, -210, 378, -378, 588, -588],
    [104, -104, 345, -345, 621, -621, 966, -966],
    [158, -158, 528, -528, 950, -950, 1477, -1477],
    [228, -228, 760, -760, 1368, -1368, 2128, -2128],
    [316, -316, 1053, -1053, 1895, -1895, 2947, -2947],
    [422, -422, 1405, -1405, 2529, -2529, 3934, -3934],
    [548, -548, 1828, -1828, 3290, -3290, 5117, -5117],
    [696, -696, 2320, -2320, 4176, -4176, 6496, -6496],
    [868, -868, 2893, -2893, 5207, -5207, 8099, -8099],
    [1064, -1064, 3548, -3548, 6386, -6386, 9933, -9933],
    [1286, -1286, 4288, -4288, 7718, -7718, 12005, -12005],
    [1536, -1536, 5120, -5120, 9216, -9216, 14336, -14336],
]


def _i32(v: int) -> int:
    v &= 0xFFFFFFFF
    return v - 0x100000000 if v >= 0x80000000 else v


def _sar(v: int, n: int) -> int:  # arithmetic shift right on 32-bit value
    return v >> n  # python ints: floor shift == arithmetic shift


class Lms:
    def __init__(self):
        self.history = [0] * LMS_LEN
        self.weights = [0] * LMS_LEN

    def copy(self):
        o = Lms()
        o.history = list(self.history)
        o.weights = list(self.weights)
        return o

    def predict(self) -> int:
        p = 0
        for i in range(LMS_LEN):
            p = _i32(p + _i32(self.weights[i] * self.history[i]))
        return _sar(p, 13)

    def update(self, sample: int, residual: int) -> None:
        delta = _sar(residual, 4)
        for i in range(LMS_LEN):
            self.weights[i] = _i32(
                self.weights[i] + (-delta if self.history[i] < 0 else delta)
            )
        self.history = self.history[1:] + [sample]


def _div(v: int, sf: int) -> int:
    reciprocal = RECIPROCAL_TAB[sf]
    n = _sar(_i32(v * reciprocal + (1 << 15)), 16)
    n = n + ((v > 0) - (v < 0)) - ((n > 0) - (n < 0))
    return n


def _clamp(v, lo, hi):
    return lo if v < lo else hi if v > hi else v


def _clamp_s16(v):
    return _clamp(v, -32768, 32767)


def encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """samples: (frames, channels) int16.  Returns a QOA file."""
    frames, channels = samples.shape
    lms = [Lms() for _ in range(channels)]
    for l in lms:
        l.weights = [0, 0, -(1 << 13), 1 << 14]
    out = bytearray(((MAGIC << 32) | frames).to_bytes(8, "big"))
    pos = 0
    while pos < frames:
        frame_len = min(FRAME_LEN, frames - pos)
        out += _encode_frame(samples[pos : pos + frame_len], lms, sample_rate)
        pos += frame_len
    return bytes(out)


def _encode_frame(sample_data: np.ndarray, lms, sample_rate: int) -> bytes:
    frame_len, channels = sample_data.shape
    slices = (frame_len + SLICE_LEN - 1) // SLICE_LEN
    frame_size = 8 + LMS_LEN * 4 * channels + 8 * slices * channels
    out = bytearray(
        (
            (channels << 56)
            | (sample_rate << 32)
            | (frame_len << 16)
            | frame_size
        ).to_bytes(8, "big")
    )
    for c in range(channels):
        h = w = 0
        for i in range(LMS_LEN):
            h = (h << 16) | (lms[c].history[i] & 0xFFFF)
            w = (w << 16) | (lms[c].weights[i] & 0xFFFF)
        out += h.to_bytes(8, "big") + w.to_bytes(8, "big")

    for start in range(0, frame_len, SLICE_LEN):
        slice_len = min(SLICE_LEN, frame_len - start)
        for c in range(channels):
            best_error = None
            best_slice = None
            best_lms = None
            for sf in range(16):
                trial = lms[c].copy()
                word = sf
                err = 0
                for si in range(start, start + slice_len):
                    sample = int(sample_data[si, c])
                    predicted = trial.predict()
                    residual = sample - predicted
                    scaled = _div(residual, sf)
                    clamped = _clamp(scaled, -8, 8)
                    quantized = QUANT_TAB[clamped + 8]
                    dequantized = DEQUANT_TAB[sf][quantized]
                    reconstructed = _clamp_s16(predicted + dequantized)
                    e = sample - reconstructed
                    err += e * e
                    if best_error is not None and err > best_error:
                        break
                    trial.update(reconstructed, dequantized)
                    word = (word << 3) | quantized
                if best_error is None or err < best_error:
                    best_error = err
                    best_slice = word
                    best_lms = trial
            lms[c] = best_lms
            best_slice <<= (SLICE_LEN - slice_len) * 3
            out += best_slice.to_bytes(8, "big")
    return bytes(out)


def decode(data: bytes):
    """Returns (samples (frames, ch) int16, sample_rate)."""
    file_header = int.from_bytes(data[0:8], "big")
    assert (file_header >> 32) == MAGIC
    total = file_header & 0xFFFFFFFF
    first = int.from_bytes(data[8:16], "big")
    channels = (first >> 56) & 0xFF
    sample_rate = (first >> 32) & 0xFFFFFF
    out = np.zeros((total, channels), dtype=np.int16)
    lms = [Lms() for _ in range(channels)]
    pos = 8
    done = 0
    while done < total and pos + 8 <= len(data):
        hdr = int.from_bytes(data[pos : pos + 8], "big")
        f_samples = (hdr >> 16) & 0xFFFF
        f_size = hdr & 0xFFFF
        p = pos + 8
        for c in range(channels):
            h = int.from_bytes(data[p : p + 8], "big")
            w = int.from_bytes(data[p + 8 : p + 16], "big")
            p += 16
            for i in range(LMS_LEN):
                hv = (h >> (48 - 16 * i)) & 0xFFFF
                wv = (w >> (48 - 16 * i)) & 0xFFFF
                lms[c].history[i] = hv - 0x10000 if hv >= 0x8000 else hv
                lms[c].weights[i] = wv - 0x10000 if wv >= 0x8000 else wv
        for start in range(0, f_samples, SLICE_LEN):
            for c in range(channels):
                word = int.from_bytes(data[p : p + 8], "big")
                p += 8
                sf = (word >> 60) & 0xF
                end = min(start + SLICE_LEN, f_samples)
                for si in range(start, end):
                    predicted = lms[c].predict()
                    quantized = (word >> 57) & 0x7
                    dequantized = DEQUANT_TAB[sf][quantized]
                    reconstructed = _clamp_s16(predicted + dequantized)
                    out[done + si, c] = reconstructed
                    word = (word << 3) & 0xFFFFFFFFFFFFFFFF
                    lms[c].update(reconstructed, dequantized)
        done += f_samples
        pos += f_size
    return out[:done], sample_rate
