#!/usr/bin/env python3
"""Identify libopus' SILK output resampler and fit polyphase kernels.

BASELINE.md's accuracy contract for Opus is ≤1e-4 PCM (or a documented
dB-equivalent) against the normative decoder at 48 kHz.  The SILK 8/12/16
kHz → 48 kHz resampler in libopus is a fixed-point IIR/FIR hybrid
(silk/resampler_private_IIR_FIR.c) whose sources are not available in this
environment — but the system itself is: decoding the SAME packets at the
SILK-native rate gives the resampler's input x (libopus skips resampling
when the API rate equals the internal rate), and decoding at 48 kHz gives
its output y = R(x).  R is linear and time-invariant per stream, so
per-phase least squares over a long noise-excited stream recovers
polyphase kernels
    y[den·n + p] = Σ_k h[p, k] · x[n + A − k]
to the fixed-point rounding floor of libopus itself (~81 dB with L=96,
A=32 — i.e. the fit IS the oracle up to its own Q15 quantization).

Run standalone (requires only the system libopus via tests/golden/
opus_oracle.py); writes audio_formats_tpu/utils/tables/
silk_resampler_fit.npz.  No dependency on /root/reference.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

L = 96   # taps per phase
A = 32   # acausal lookahead (input samples ahead of the output point)


def fit_bandwidth(O, bw_ctl, in_rate, den, n_pk=120, seed=3):
    rng = np.random.default_rng(seed)
    N = 960
    t = np.arange(N * n_pk) / 48000.0
    sig = np.clip(
        3500 * rng.standard_normal(t.size)
        + 6000 * np.sin(2 * np.pi * 700 * t),
        -30000, 30000).astype(np.int16)[:, None]
    enc = O.OracleEncoder(48000, 1, bitrate=20000,
                          application=O.OPUS_APPLICATION_VOIP,
                          signal=O.OPUS_SIGNAL_VOICE, bandwidth=bw_ctl)
    pkts = [enc.encode(sig[n * N : (n + 1) * N]) for n in range(n_pk)]
    dn = O.OracleDecoder(in_rate, 1)
    d48 = O.OracleDecoder(48000, 1)
    x = np.concatenate([dn.decode(p) for p in pkts])[:, 0].astype(np.float64)
    y = np.concatenate([d48.decode(p) for p in pkts])[:, 0].astype(np.float64)
    skip = 4000 // den
    n_max = min(len(x) - L - A, len(y) // den) - skip - 100
    rows = np.arange(skip, skip + n_max)
    X = np.stack([x[rows + A - k] for k in range(L)], axis=1)
    hs, snrs = [], []
    for p in range(den):
        Y = y[rows * den + p]
        h, *_ = np.linalg.lstsq(X, Y, rcond=None)
        err = Y - X @ h
        snrs.append(float(10 * np.log10((Y ** 2).mean() / (err ** 2).mean())))
        hs.append(h)
    return np.stack(hs), snrs


def main():
    from golden import opus_oracle as O

    if O.get_lib() is None:
        print("libopus not available; cannot fit", file=sys.stderr)
        return 1
    out = {}
    report = {}
    for name, bwc, rate, den in (
        ("nb", O.OPUS_BANDWIDTH_NARROWBAND, 8000, 6),
        ("mb", O.OPUS_BANDWIDTH_MEDIUMBAND, 12000, 4),
        ("wb", O.OPUS_BANDWIDTH_WIDEBAND, 16000, 3),
    ):
        h, snrs = fit_bandwidth(O, bwc, rate, den)
        out[f"h_{name}"] = h
        report[name] = snrs
        print(f"{name}: den={den} fit SNR "
              f"{['%.1f dB' % s for s in snrs]}")
    out["L"] = np.int32(L)
    out["A"] = np.int32(A)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "audio_formats_tpu", "utils", "tables",
                        "silk_resampler_fit.npz")
    np.savez(path, **out)
    print("wrote", path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
