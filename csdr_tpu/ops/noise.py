"""Noise / test-signal sources (SURVEY.md §2.10).

The reference seeds from /dev/urandom (libcsdr.c:2444-2476) and supports
deterministic replay via --awgnfile (csdr.c:3042-3046).  Here determinism is
first-class: every source takes a seed (JAX threefry PRNG).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from csdr_tpu.core.cplx import CF


def uniform_noise_f(n: int, seed: int = 0):
    """Uniform in [-1, 1) (reference uniform_noise_f via urandom ints)."""
    return jax.random.uniform(jax.random.key(seed), (n,), jnp.float32, -1.0, 1.0)


def gaussian_noise_c(n: int, seed: int = 0) -> CF:
    """Unit-variance-per-component complex gaussian (reference
    get_random_gaussian_samples_c, Box-Muller, libcsdr.c:2458-2470)."""
    k1, k2 = jax.random.split(jax.random.key(seed))
    return CF(jax.random.normal(k1, (n,), jnp.float32),
              jax.random.normal(k2, (n,), jnp.float32))


def awgn_cc(x: CF, snr_db: float, seed: int = 0) -> CF:
    """Add noise at given SNR with the reference's amplitude split
    (csdr.c:3050-3052): r = 10^(snr/20); out = x*r/(r+1) + noise/(r+1),
    noise scaled by a further 0.707 per component (csdr.c:3080) so the
    COMPLEX noise power equals a_noise^2."""
    r = 10.0 ** (snr_db / 20.0)
    a_signal = r / (r + 1.0)
    a_noise = 0.707 / (r + 1.0)
    nz = gaussian_noise_c(x.shape[0], seed)
    return CF(x.re * a_signal + nz.re * a_noise,
              x.im * a_signal + nz.im * a_noise)


def yes_f(value: float, n: int):
    """Constant source (reference csdr.c:687-702)."""
    return jnp.full((n,), value, jnp.float32)


def repeat_u8(pattern, n_repeats: int):
    """Repeat a byte pattern (reference csdr.c:3018-3033)."""
    p = jnp.asarray(pattern, jnp.uint8)
    return jnp.tile(p, n_repeats)


def add_n_zero_samples_at_beginning_f(x, n_zero: int):
    """reference csdr.c add_n_zero_samples_at_beginning_f"""
    return jnp.concatenate([jnp.zeros((n_zero,), x.dtype), x])
