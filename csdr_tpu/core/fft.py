"""Planar-complex FFT: the framework's L1b (reference fft_fftw.c:6-45).

The axon TPU runtime has no complex dtype and no FFT op, so the backend is a
Stockham autosort radix-2 FFT written directly on CF planes — pure
reshape/stack/multiply jnp ops that XLA fuses well on any backend.  Sizes are
powers of two, which covers every size the reference ever plans (all are
next_pow2 results: csdr.c:1833-1837, fastddc.c:52).

Plan reuse / FFTW_MEASURE (the reference's `benchmark` flag) correspond to
jit compilation caching — a transform of a given (batch, N) compiles once.

Twiddles are precomputed in float64 on host and embedded as f32 constants,
so accuracy is ~1e-7 relative (float32 rounding only), comparable to fftw3f.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from csdr_tpu.core.cplx import CF


@functools.lru_cache(maxsize=None)
def _twiddles(n: int, sign: int):
    half = n // 2
    w = np.exp(sign * 2j * np.pi * np.arange(half) / n)
    return (np.asarray(w.real, np.float32).reshape(half, 1),
            np.asarray(w.imag, np.float32).reshape(half, 1))


def _stockham(re, im, sign: int):
    batch = re.shape[:-1]
    n_total = re.shape[-1]
    stages = int(np.log2(n_total))
    assert (1 << stages) == n_total, f"FFT size {n_total} not a power of 2"
    re = re.reshape(batch + (n_total, 1))
    im = im.reshape(batch + (n_total, 1))
    n, s = n_total, 1
    while n > 1:
        half = n // 2
        er, ei = re[..., :half, :], im[..., :half, :]
        orr, oi = re[..., half:, :], im[..., half:, :]
        twr, twi = _twiddles(n, sign)
        twr = jnp.asarray(twr)
        twi = jnp.asarray(twi)
        ar, ai = er + orr, ei + oi
        dr, di = er - orr, ei - oi
        br = dr * twr - di * twi
        bi = dr * twi + di * twr
        re = jnp.stack([ar, br], axis=-2).reshape(batch + (half, 2 * s))
        im = jnp.stack([ai, bi], axis=-2).reshape(batch + (half, 2 * s))
        n, s = half, 2 * s
    return re.reshape(batch + (n_total,)), im.reshape(batch + (n_total,))


def fft(x: CF) -> CF:
    """Forward DFT over the last axis (unnormalized, FFTW sign convention)."""
    re, im = _stockham(x.re, x.im, -1)
    return CF(re, im)


def ifft(x: CF, normalize: bool = False) -> CF:
    """Inverse DFT (unnormalized by default, like FFTW backward;
    the reference divides by size explicitly, libcsdr.c:833-837)."""
    re, im = _stockham(x.re, x.im, +1)
    if normalize:
        n = x.shape[-1]
        re, im = re / n, im / n
    return CF(re, im)


def rfft(x) -> CF:
    """Real-input forward DFT, full-size output (the reference's r2c path
    keeps only n/2+1 bins; callers slice if they want that)."""
    return fft(CF(jnp.asarray(x, jnp.float32), jnp.zeros_like(x, jnp.float32)))


def fft_swap_sides(x: CF) -> CF:
    """fftshift (reference fastddc.c:91-104 fft_swap_sides)."""
    n = x.shape[-1]
    return CF(jnp.roll(x.re, n // 2, axis=-1), jnp.roll(x.im, n // 2, axis=-1))


def next_pow2(x: int) -> int:
    """Smallest power of two strictly greater than x (reference
    libcsdr.c:1240-1249 returns 1<<i for the first 1<<i > x)."""
    p = 1
    while p <= x:
        p *= 2
    return p


def log2n(x: int) -> int:
    """Exact log2 or -1 for non-powers-of-2 (reference libcsdr.c:1220-1228,
    including x <= 0 -> -1 rather than a log-domain crash)."""
    if x <= 0:
        return -1
    l = int(np.log2(x))
    return l if (1 << l) == x else -1
