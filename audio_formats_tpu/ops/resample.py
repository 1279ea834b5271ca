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


# ---------------------------------------------------------------------------
# Exact mirror of the reference's OpusResampler (the speex-style windowed
# sinc, dopus.d:5381-6240) at quality 3 (Voip) — the quality the reference's
# Opus decoder uses for the SILK 8/12/16 kHz -> 48 kHz path
# (dopus.d:6326: `s.flr.setup(chans, silk_samplerate, 48000, 3)`).
#
# For these integer upsampling ratios the speex state machine reduces to
# the "basic direct" float path (dopus.d:6097): intAdvance = 0,
# fracAdvance = 1, a [denRate, 48] sinc table, and per-output
#   out[m] = Σ_j sinc[frac_m, j] · x[last_m + j]
# with last advancing one input sample every denRate outputs.  The decoder
# feeds silk_resample_delay[bw] samples of silence at init
# (dopus.d:6331/6243) so output aligns with libopus' own SILK resampler.
# ---------------------------------------------------------------------------

_KAISER8 = np.array([
    0.99635258, 1.00000000, 0.99635258, 0.98548012, 0.96759014, 0.94302200,
    0.91223751, 0.87580811, 0.83439927, 0.78875245, 0.73966538, 0.68797126,
    0.63451750, 0.58014482, 0.52566725, 0.47185369, 0.41941150, 0.36897272,
    0.32108304, 0.27619388, 0.23465776, 0.19672670, 0.16255380, 0.13219758,
    0.10562887, 0.08273982, 0.06335451, 0.04724088, 0.03412321, 0.02369490,
    0.01563093, 0.00959968, 0.00527363, 0.00233883, 0.00050000, 0.00000000,
    0.0, 0.0, 0.0, 0.0])  # padded: computeFunc reads table[ind..ind+3]
_K8_OVERSAMPLE = 32


def _compute_func(x: float) -> float:
    """dopus.d computeFunc: cubic interpolation into the Kaiser8 table."""
    y = np.float32(x) * _K8_OVERSAMPLE
    ind = int(np.floor(y))
    frac = float(np.float32(y - ind))
    f2 = frac * frac
    f3 = f2 * frac
    interp3 = -0.1666666667 * frac + 0.1666666667 * f3
    interp2 = frac + 0.5 * f2 - 0.5 * f3
    interp0 = -0.3333333333 * frac + 0.5 * f2 - 0.1666666667 * f3
    interp1 = 1.0 - interp3 - interp2 - interp0
    t = _KAISER8
    return (interp0 * t[ind] + interp1 * t[ind + 1]
            + interp2 * t[ind + 2] + interp3 * t[ind + 3])


def _speex_sinc(cutoff: float, x: float, N: int) -> float:
    ax = abs(np.float32(x))
    if ax < 1.0e-6:
        return np.float32(cutoff)
    if ax > 0.5 * N:
        return np.float32(0.0)
    xx = np.float32(x) * np.float32(cutoff)
    pixx = np.pi * float(xx)
    return np.float32(
        cutoff * np.sin(pixx) / pixx * _compute_func(2.0 * float(ax) / N)
    )


class SpeexResampler:
    """Reference-exact OpusResampler at quality 3, upsampling to 48 kHz.

    State mirrors the D struct: a (filterLen-1)-sample history, lastSample
    initialized to filterLen/2 (skipZeros), sampFracNum phase.  The decoder
    wrapper must feed silk_resample_delay[bw] zeros once after (re)init
    (opus_init_resample, dopus.d:6315-6338)."""

    QUALITY_N = 48      # qualityMap[3].baseLength
    CUTOFF = 0.917      # qualityMap[3].upsampleBandwidth

    def __init__(self, in_rate: int, out_rate: int = 48000):
        import math

        self.in_rate = in_rate
        g = math.gcd(in_rate, out_rate)
        self.num = in_rate // g
        self.den = out_rate // g
        assert self.num == 1 and self.den in (3, 4, 6), \
            "SILK rates divide 48000"
        N = self.QUALITY_N
        table = np.zeros((self.den, N), np.float32)
        for i in range(self.den):
            for j in range(N):
                table[i, j] = _speex_sinc(
                    self.CUTOFF, (j - N // 2 + 1) - i / float(self.den), N)
        self.table = table
        self.hist = np.zeros(N - 1, np.float32)
        self.last = N // 2          # skipZeros
        self.frac = 0

    def reset(self):
        self.hist[:] = 0
        self.last = self.QUALITY_N // 2
        self.frac = 0

    def process(self, x: np.ndarray, out_max: int) -> np.ndarray:
        """Mirror of swrconvert for one channel: consumes as much of ``x``
        as fits, produces at most ``out_max`` samples (float32)."""
        N = self.QUALITY_N
        x = np.asarray(x, np.float32)
        n = x.shape[0]
        buf = np.concatenate([self.hist, x])
        # number of producible outputs: first m with last_m >= n
        m_stop = max(0, (n - self.last) * self.den - self.frac)
        n_out = min(out_max, m_stop)
        if n_out > 0:
            m = np.arange(n_out)
            fr = self.frac + m
            last = self.last + fr // self.den
            phase = fr % self.den
            W = np.lib.stride_tricks.sliding_window_view(buf, N)[last]
            y = np.einsum("mj,mj->m", W.astype(np.float32),
                          self.table[phase]).astype(np.float32)
        else:
            y = np.zeros(0, np.float32)
        fr_end = self.frac + n_out
        last_end = self.last + fr_end // self.den
        self.frac = fr_end % self.den
        consumed = min(n, last_end)
        self.last = last_end - consumed
        self.hist = buf[consumed : consumed + N - 1]
        return y

    def flush(self, count: int) -> np.ndarray:
        """Drain `count` more samples by feeding silence (the stream tail;
        FFmpeg's flush-the-resampler step)."""
        outs = []
        got = 0
        while got < count:
            y = self.process(np.zeros(160, np.float32), count - got)
            outs.append(y)
            got += y.shape[0]
        return (np.concatenate(outs)[:count] if outs
                else np.zeros(0, np.float32))


# ---------------------------------------------------------------------------
# libopus-identified SILK resampler (the production path).
#
# BASELINE.md's Opus contract is measured against the normative decoder at
# 48 kHz.  tools/fit_silk_resampler.py system-identifies libopus' own
# fixed-point SILK output resampler through the opus oracle (decode the
# same packets at the native rate and at 48 kHz; least-squares the LTI map)
# — the fitted polyphase kernels reproduce it to ~81 dB, libopus' own Q15
# rounding floor.  Alignment is inherent: out[den·n + p] sits at exactly
# the 48 kHz stream position libopus emits it at.
# ---------------------------------------------------------------------------

_FIT_PATH = __file__.replace("ops/resample.py",
                             "utils/tables/silk_resampler_fit.npz")
_FIT_CACHE = {}


def _fit_tables():
    if not _FIT_CACHE:
        z = np.load(_FIT_PATH)
        _FIT_CACHE.update(
            {k: z[k] for k in ("h_nb", "h_mb", "h_wb")},
            L=int(z["L"]), A=int(z["A"]),
        )
    return _FIT_CACHE


class FittedUpsampler:
    """Streaming polyphase upsampler with the libopus-identified kernels.

    out[den·n + p] = Σ_k h[p, k] · x[n + A − k]: each output group n needs
    input up to x[n+A], so the stream runs A·den samples short until EOS
    (`flush` drains the tail) — the same delayed-samples shape as the
    reference decoder (dopus.d:6393)."""

    def __init__(self, bandwidth: int):
        t = _fit_tables()
        self.h = [t["h_nb"], t["h_mb"], t["h_wb"]][bandwidth]
        self.den = self.h.shape[0]
        self.L = t["L"]
        self.A = t["A"]
        # x window for output group n: [n+A-L+1, n+A]; keep L+A history
        self._hist = np.zeros(self.L, np.float64)
        self._pending = np.zeros(0, np.float64)  # inputs not yet consumed

    def process(self, x: np.ndarray, out_max: int) -> np.ndarray:
        buf = np.concatenate([self._hist, self._pending,
                              np.asarray(x, np.float64)])
        # x-coordinate c sits at buf index c+L (hist = x[-L..-1]); output
        # group n reads the window x[n+A-L+1 .. n+A] = buf[n+A+1 : n+A+1+L]
        P = buf.shape[0] - self.L  # inputs seen so far (this buffer)
        n_groups = max(0, min(P - self.A, out_max // self.den))
        if n_groups:
            W = np.lib.stride_tricks.sliding_window_view(
                buf, self.L)[self.A + 1 : self.A + 1 + n_groups]
            # h[p, k] multiplies x[n+A-k]: reverse the tap axis
            y = W @ self.h[:, ::-1].T       # [n, den]
            y = y.reshape(-1).astype(np.float32)
        else:
            y = np.zeros(0, np.float32)
        rest = buf[n_groups:]
        self._hist = rest[: self.L]
        self._pending = rest[self.L :]
        return y

    def flush(self, count: int) -> np.ndarray:
        pad = (count + self.den - 1) // self.den + self.A + 1
        y = self.process(np.zeros(pad, np.float64), count)
        return y[:count]

    def reset(self):
        self._hist[:] = 0
        self._pending = np.zeros(0, np.float64)


class BatchedFittedUpsampler:
    """N FittedUpsampler lanes in lockstep — the SILK group's device DSP.

    The per-lane polyphase dot products (FittedUpsampler.process) become
    ONE device convolution per block over a [rows, T] native-rate batch:
    lhs [rows, 1, W] * rhs [den, 1, L] cross-correlation with the tap
    axis reversed reproduces out[n·den+p] = Σ_k h[p,k]·x[n+A−k] for every
    lane at once.  State (hist+pending) stays uniform across rows because
    lockstep groups feed uniform block lengths; a lane that ends early is
    drained with flush_row (exact f64 per-row math) BEFORE later blocks
    zero-feed its row, so its tail equals the single-stream decoder's."""

    def __init__(self, bandwidth: int, rows: int, feed: int = 0):
        t = _fit_tables()
        self.h = np.asarray(
            [t["h_nb"], t["h_mb"], t["h_wb"]][bandwidth], np.float64)
        self.den = self.h.shape[0]
        self.L = int(t["L"])
        self.A = int(t["A"])
        self.rows = rows
        self._hist = np.zeros((rows, self.L), np.float64)
        self._pending = np.zeros((rows, 0), np.float64)
        if feed:
            self.process(np.zeros((rows, feed), np.float64), 0)

    def process(self, x: np.ndarray, out_max: int) -> np.ndarray:
        buf = np.concatenate(
            [self._hist, self._pending, np.asarray(x, np.float64)], axis=1)
        P = buf.shape[1] - self.L
        n_groups = max(0, min(P - self.A, out_max // self.den))
        if n_groups:
            y = np.asarray(_poly_conv_rows(
                buf[:, self.A + 1 : self.A + 1 + n_groups + self.L - 1]
                .astype(np.float32),
                self.h[:, ::-1].astype(np.float32),
                G=n_groups))
        else:
            y = np.zeros((self.rows, 0), np.float32)
        rest = buf[:, n_groups:]
        self._hist = rest[:, : self.L]
        self._pending = rest[:, self.L :]
        return y

    def flush_row(self, r: int, count: int) -> np.ndarray:
        """Drain row r's delayed tail (FittedUpsampler.flush, f64)."""
        pad = (count + self.den - 1) // self.den + self.A + 1
        buf = np.concatenate(
            [self._hist[r], self._pending[r], np.zeros(pad)])
        P = buf.shape[0] - self.L
        n_groups = max(0, min(P - self.A, count // self.den))
        if not n_groups:
            return np.zeros(0, np.float32)
        W = np.lib.stride_tricks.sliding_window_view(
            buf, self.L)[self.A + 1 : self.A + 1 + n_groups]
        y = (W @ self.h[:, ::-1].T).reshape(-1).astype(np.float32)
        return y[:count]


def _poly_conv_rows(x, h_rev, G: int):
    """jitted [rows, W] x [den, L] polyphase conv -> [rows, G*den]."""
    import functools

    global _POLY_CONV_JIT
    try:
        fn = _POLY_CONV_JIT
    except NameError:
        import jax

        @functools.partial(jax.jit, static_argnames=("G",))
        def fn(x, h_rev, G):
            import jax.numpy as jnp

            out = jax.lax.conv_general_dilated(
                x[:, None, :], h_rev[:, None, :],
                window_strides=(1,), padding="VALID",
                dimension_numbers=("NCH", "OIH", "NCH"),
                precision=jax.lax.Precision.HIGHEST)
            return jnp.swapaxes(out, 1, 2).reshape(x.shape[0], -1)

        _POLY_CONV_JIT = fn
    return fn(x, h_rev, G=G)
