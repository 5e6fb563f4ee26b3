"""NCO frequency shift (mixer): output[n] = input[n] * e^{j(phi0 + 2*pi*rate*n)}.

The reference carries FIVE equivalent implementations whose only purpose is to
make per-sample sin/cos affordable on scalar CPUs (SURVEY.md §2.3:
shift_math_cc libcsdr.c:186-207, shift_table_cc :211-265, shift_addition_cc
libcsdr_gpl.c:27-89, shift_addfast_cc :307-465, shift_unroll_cc :268-305).
On TPU the VPU evaluates sin/cos vector-wide, so ONE direct-form NCO covers
them all — no recurrence, therefore none of the reference's accumulated
rounding error (libcsdr_gpl.c:94-124 measures that drift).  ``variant=`` is
accepted at the CLI layer for compatibility and ignored.

Phase convention matches the reference: phase step per sample is 2*pi*rate
(rate in cycles/sample = f_shift/samp_rate); mixing is
out = in * (cos(phi) + j*sin(phi)).  Signals are planar CF pairs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from csdr_tpu.core.block import Block
from csdr_tpu.core.cplx import CF, expj

TWO_PI = 2.0 * np.pi


def _frac_cycles_static(n: int, rate: float) -> np.ndarray:
    """frac(arange(n)*rate) computed host-side in float64 — exact to 1 ULP.

    For a static ``rate`` the whole phase ramp is a compile-time constant, so
    the oscillator costs one sin/cos + one complex multiply per sample at run
    time with no accumulated error at all (unlike every reference variant,
    which trades accuracy for trig-call count)."""
    return np.mod(np.arange(n, dtype=np.float64) * np.float64(rate), 1.0).astype(np.float32)


def _frac_mul(idx, rate, max_val: int):
    """frac(idx * rate) for a *traced* f32 rate and non-negative int32
    ``idx`` (scalar or array, traced or static), error ~1 ULP of a cycle
    INDEPENDENT of idx (live retuning path).

    Split idx into 12-bit digits d_k; frac(idx*rate) = frac(sum d_k*s_k)
    with s_k = frac(4096^k * rate).  The s_k recurrence is EXACT in f32
    (x*4096 shifts the exponent, %1 keeps a <=24-bit fraction), and each
    s_k is split into a 12-bit head + tail so d*s_hi is an exact 24-bit
    product (its %1 is exact too) and d*s_lo < 1 rounds once.  Total error
    is a few additions' ULPs — vs ~4096*eps cycles for the naive
    d_k*s_k form, which drifted to 1e-4 rad by 4k samples (caught by
    tests/test_chunk_invariance.py; the reference's own recurrence NCOs
    drift comparably, libcsdr_gpl.c:94-124, but we can be exact)."""
    idx = jnp.asarray(idx, jnp.int32)
    rate = jnp.asarray(rate, jnp.float32) % 1.0
    acc = jnp.zeros(idx.shape, jnp.float32)
    step = rate
    for shift in range(0, 31, 12):
        digit = ((idx >> shift) & 0xFFF).astype(jnp.float32)
        s_hi = jnp.floor(step * 4096.0) * (1.0 / 4096.0)
        s_lo = step - s_hi
        acc = (acc + (digit * s_hi) % 1.0) % 1.0
        acc = (acc + digit * s_lo) % 1.0
        step = (step * 4096.0) % 1.0
        if (1 << (shift + 12)) >= max_val:
            break
    return acc


def _frac_cycles_dynamic(n: int, rate):
    """frac(arange(n)*rate) for a *traced* rate (live retuning path)."""
    return _frac_mul(jnp.arange(n, dtype=jnp.int32), rate, n)


def _wrap_phase(p):
    """Wrap to (-pi, pi] like the reference's while-loops."""
    return jnp.asarray((p + np.pi) % TWO_PI - np.pi, jnp.float32)


def shift_cc(x: CF, rate, phase=0.0):
    """Mix by ``rate`` cycles/sample starting at ``phase``; returns (y, next_phase).

    Matches shift_math_cc semantics (reference libcsdr.c:186-207)."""
    n = x.shape[0]
    if isinstance(rate, (int, float)):
        cycles = jnp.asarray(_frac_cycles_static(n, rate))
        step_total = float((n * np.float64(rate)) % 1.0)
    else:
        cycles = _frac_cycles_dynamic(n, rate)
        # frac(n*rate) via the exact digit split: the naive f32 product
        # rounds to ~n*eps cycles and that error lands in the CARRIED
        # phase every chunk
        step_total = _frac_mul(n, rate, n + 1)
    y = x * expj(phase + TWO_PI * cycles)
    next_phase = _wrap_phase(phase + TWO_PI * step_total)
    return y, next_phase


def shift_block(rate: float, name: str = "shift_cc") -> Block:
    """Streaming Block carrying the oscillator phase across blocks —
    the pytree form of the reference's ``starting_phase`` return value."""

    def init():
        return jnp.float32(0.0)

    def apply(phase, x):
        y, next_phase = shift_cc(x, rate, phase)
        return next_phase, y

    return Block(name=name, init=init, apply=apply)


def shift_fc(x, rate, phase=0.0):
    """Real -> complex + shift (reference libcsdr_gpl.c:54-79 shift_addition_fc):
    out = x[n] * e^{j phi_n} (modulator path).  x is a real array."""
    return shift_cc(CF(jnp.asarray(x, jnp.float32), jnp.zeros_like(x, jnp.float32)),
                    rate, phase)


def decimating_shift_cc(x: CF, rate, decimation, phase=0.0, start_offset=0):
    """Fused shift+decimate (reference libcsdr_gpl.c:126-160
    decimating_shift_addition_cc): take every ``decimation``-th sample starting
    at ``start_offset`` and rotate by an NCO stepping ``rate`` cycles per
    *taken* sample (callers pass rate*decimation, fastddc.c:69).
    Returns (y, count, next_phase, next_offset); y has capacity
    ceil(n/decimation), entries past ``count`` are zero.
    """
    n_in = x.shape[0]
    cap = (n_in + decimation - 1) // decimation
    # dynamic START + static STRIDE: a traced gather start makes XLA emit a
    # full dynamic gather (~100x slower on TPU); dynamic_slice + static
    # strided slice compiles to cheap copies instead
    off = jnp.asarray(start_offset, jnp.int32)
    pad = cap * decimation - n_in + decimation
    xp_re = jnp.concatenate([x.re, jnp.zeros((pad,), x.re.dtype)])
    xp_im = jnp.concatenate([x.im, jnp.zeros((pad,), x.im.dtype)])
    base_re = jax.lax.dynamic_slice_in_dim(xp_re, off, cap * decimation)
    base_im = jax.lax.dynamic_slice_in_dim(xp_im, off, cap * decimation)
    idx = off + decimation * jnp.arange(cap, dtype=jnp.int32)
    valid = idx < n_in
    from csdr_tpu.core import cplx
    taken = cplx.where(valid, CF(base_re[::decimation], base_im[::decimation]),
                       CF.scalar(0.0))
    if isinstance(rate, (int, float)):
        cycles = jnp.asarray(np.mod(np.arange(cap, dtype=np.float64) * np.float64(rate), 1.0).astype(np.float32))
    else:
        cycles = _frac_mul(jnp.arange(cap, dtype=jnp.int32), rate, cap)
    ph = phase + TWO_PI * cycles
    y = taken * expj(ph)
    y = cplx.where(valid, y, CF.scalar(0.0))
    count = jnp.sum(valid.astype(jnp.int32))
    # count is traced, so even a static rate goes through the digit-split
    # frac (a naive f32 count*rate rounds to ~count*eps cycles per chunk)
    next_phase = _wrap_phase(
        phase + TWO_PI * _frac_mul(count, jnp.asarray(rate, jnp.float32),
                                   cap + 1))
    next_offset = (start_offset + decimation * count) - n_in
    return y, count, next_phase, next_offset
