"""Gain / limiting / DC blocking / power metering / in-stream sanitizers
(SURVEY.md §2.7 and the monitor commands of §2.1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from csdr_tpu.core.block import Block
from csdr_tpu.core import cplx
from csdr_tpu.core.cplx import CF


def gain_ff(x, gain):
    """reference libcsdr.c:1139-1142"""
    return (x * gain).astype(x.dtype)


def limit_ff(x, max_amplitude=1.0):
    """Clamp to [-max, max] (reference libcsdr.c:1130-1137)."""
    return jnp.clip(x, -max_amplitude, max_amplitude)


def clipdetect_ff(x):
    """Returns count of samples outside [-1, 1] (the reference prints a
    warning to stderr, csdr.c:220-228; here the monitor is a reduction the
    caller can report)."""
    return jnp.sum((x < -1.0) | (x > 1.0))


def detect_nan_ff(x):
    """Returns count of NaNs (reference csdr.c:1034-1054)."""
    return jnp.sum(jnp.isnan(x))


def dcblock_ff(x, a=0.999, last_input=0.0, last_output=0.0):
    """DC-blocking IIR y[i] = x[i] - x[i-1] + a*y[i-1]
    (reference libcsdr.c:903-918), as an associative scan.
    Returns (y, (next_last_input, next_last_output))."""
    prev = jnp.concatenate([jnp.reshape(jnp.asarray(last_input, jnp.float32), (1,)), x[:-1]])
    v = x - prev                       # feed-forward part
    n = x.shape[0]
    bs = jnp.full((n,), a, jnp.float32)
    # shared two-level column-major affine prefix (a flat 1-D scan at 1M
    # elements is ~13x slower on this backend and was observed to wedge
    # the axon worker)
    from csdr_tpu.ops.demod import _affine_prefix_2level
    y = _affine_prefix_2level(bs, v.astype(jnp.float32),
                              jnp.asarray(last_output, jnp.float32))
    return y, (x[-1], y[-1])


def dcblock_block(a=0.999) -> Block:
    def init():
        return (jnp.float32(0.0), jnp.float32(0.0))

    def apply(state, x):
        y, state = dcblock_ff(x, a, state[0], state[1])
        return state, y

    return Block("dcblock_ff", init, apply)


def fastdcblock_ff(x, last_dc_level=0.0):
    """Block-average DC removal with linear gain ramp
    (reference libcsdr.c:920-941).  Returns (y, next_dc_level)."""
    n = x.shape[0]
    avg = jnp.mean(x)
    ramp = jnp.arange(n, dtype=jnp.float32) / n
    level = last_dc_level + (avg - last_dc_level) * ramp
    return (x - level).astype(jnp.float32), avg


def fastdcblock_block() -> Block:
    def init():
        return jnp.float32(0.0)

    def apply(level, x):
        y, level = fastdcblock_ff(x, level)
        return level, y

    return Block("fastdcblock_ff", init, apply)


def get_power_f(x, decimation: int = 1):
    """Mean power with optional stride; NOTE the reference divides by the
    full input_size even when striding (libcsdr.c:1144-1152) — reproduced."""
    return jnp.sum(x[::decimation] * x[::decimation]) / x.shape[0]


def get_power_c(x: CF, decimation: int = 1):
    xs = x[::decimation]
    return jnp.sum(xs.abs2()) / x.shape[0]


def add_dcoffset_cc(x: CF) -> CF:
    """reference libcsdr.c:1174-1178: i -> 0.5 + i/2, q -> q/2."""
    return CF(0.5 + x.re / 2, x.im / 2)


def fixed_amplitude_cc(x: CF, new_amplitude) -> CF:
    """Normalize each sample to a fixed magnitude (reference libcsdr.c:1198-1212)."""
    amp = x.abs()
    gain = jnp.where(amp > 0, new_amplitude / amp, 0.0)
    return x * gain


def add_ff(a, b):
    return a + b


def squelch_and_smeter_cc(x: CF, squelch_level, use_every_nth: int = 1):
    """Power gate + S-meter (reference csdr.c:2192-2243): compute block power
    (strided), zero the block if power < level (unless level == 0).
    Returns (y, power).  FIFO-based live control/reporting maps to the scalar
    ``squelch_level`` input and ``power`` output of the jitted step."""
    power = get_power_c(x, use_every_nth)
    open_ = (squelch_level == 0.0) | (power >= squelch_level)
    y = cplx.where(open_, x, CF.scalar(0.0))
    return y, power


def squelch_block(use_every_nth: int = 1) -> Block:
    """Squelch with the level carried in state so it can be retuned between
    blocks (the reference retunes via FIFO, csdr.c:2210-2222)."""

    def init():
        return jnp.float32(0.0)  # level; 0 = always open

    def apply(level, x):
        y, _power = squelch_and_smeter_cc(x, level)
        return level, y

    return Block("squelch_and_smeter_cc", init, apply)
