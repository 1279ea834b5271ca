"""IMDCT + Vorbis windowing kernels.

The Vorbis IMDCT (stb_vorbis2.d:1941-2250's radix kernel) is here a single
[N/2, N] matmul per block size — block sizes are few (typically 256/2048 per
stream, spec range 64..8192) and the matrices are built lazily per size, so
the MXU does all the work with zero twiddle bookkeeping.  Spec convention
(Vorbis I spec §4.3.6 / MDCT with N output samples from N/2 coefficients):

    y[n] = Σ_{k<N/2} X[k] · cos(π/(2N) · (2n + 1 + N/2) · (2k + 1))

Windows are the spec's sin(π/2·sin²(...)) slopes; overlap-add applies slopes
only in the lapped region (the reference defers windowing to finish_frame,
stb_vorbis2.d:2606-2640, which is equivalent since the window is 0/1
elsewhere)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def imdct_matrix(n: int) -> np.ndarray:
    """[n/2, n] float32 IMDCT matrix for block size n."""
    m = n // 2
    k = np.arange(m)[:, None]
    t = np.arange(n)[None, :]
    return np.cos(
        np.pi / (2.0 * n) * (2 * t + 1 + m) * (2 * k + 1)
    ).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _imdct_matrix_f64(n: int) -> np.ndarray:
    return imdct_matrix(n).astype(np.float64)


def imdct_host(X: np.ndarray, n: int) -> np.ndarray:
    """Host IMDCT for the single-stream facade: per-packet device dispatch
    would pay an interconnect round-trip per packet, which dwarfs the
    matmul.  f64 accumulation then f32 cast matches the device path's
    HIGHEST-precision contract."""
    return (X.astype(np.float64) @ _imdct_matrix_f64(n)).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("n",))
def imdct(X: jax.Array, n: int) -> jax.Array:
    """X: [lanes, n/2] spectral coefficients → [lanes, n] raw time samples."""
    return jnp.matmul(
        X, jnp.asarray(imdct_matrix(n)),
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.lru_cache(maxsize=None)
def vorbis_slope(length: int) -> np.ndarray:
    """Right-rising window slope of `length` samples:
    w[j] = sin(π/2 · sin²(π/(2L)·(j+0.5)))."""
    j = np.arange(length)
    s = np.sin(np.pi / (2.0 * length) * (j + 0.5))
    return np.sin(np.pi / 2.0 * s * s).astype(np.float32)


def overlap_add(y: np.ndarray, prev: np.ndarray, left_start: int) -> None:
    """In-place lapped mix (vorbis_finish_frame, stb_vorbis2.d:2617-2627):
    y[:, left_start + j] = y[..]*w[j] + prev[:, j]*w[L-1-j], L = prev width.
    """
    L = prev.shape[1]
    if L == 0:
        return
    w = vorbis_slope(L)
    seg = y[:, left_start : left_start + L]
    y[:, left_start : left_start + L] = seg * w + prev * w[::-1]
