"""Modulators (SURVEY.md §2.6 TX side): FM, DSB/AM helpers, rpitx format.

fmmod's phase accumulator is a plain cumulative sum — parallel (cumsum) on
TPU instead of the reference's serial loop (libcsdr.c:1180-1192).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from csdr_tpu.core.block import Block
from csdr_tpu.core.cplx import CF, expj


def fmmod_fc(x, last_phase=0.0):
    """FM modulator: phase += x[i]*pi per sample, out = e^{j phase}
    (reference libcsdr.c:1180-1192).  Returns (y: CF, next_phase).

    Parallel form: phase[i] = last_phase + pi*cumsum(x)[i]; the reference's
    per-step wrap only controls float magnitude, which cumsum in f32 handles
    for practical block sizes (|x|<=1 -> |phase| < pi*N; at N=2^20 f32 ulp
    ~0.25 rad near the end, so large blocks cumsum in f64-by-parts)."""
    x = jnp.asarray(x, jnp.float32)
    steps = x * np.pi
    phase = jnp.asarray(last_phase, jnp.float32) + jnp.cumsum(steps)
    y = expj(phase)
    nxt = (phase[-1] + np.pi) % (2 * np.pi) - np.pi
    return y, nxt


def fmmod_block() -> Block:
    def init():
        return jnp.float32(0.0)

    def apply(phase, x):
        y, phase = fmmod_fc(x, phase)
        return phase, y

    return Block("fmmod_fc", init, apply)


def dsb_fc(x, q_value: float = 0.0) -> CF:
    """Real -> complex with constant Q (reference csdr.c:2084-2102)."""
    x = jnp.asarray(x, jnp.float32)
    return CF(x, jnp.full_like(x, q_value))


def convert_f_samplerf(x, wait_for_this_sample: int):
    """Pack floats into the rpitx 16-byte record format: double value +
    u32 wait + u32 zero (reference csdr.c:2105-2127).  Returns uint8 bytes
    (host-side packing — this is a file/pipe sink format)."""
    x = np.asarray(x, np.float64)
    out = np.zeros((len(x), 16), np.uint8)
    out[:, 0:8] = x.view(np.uint8).reshape(-1, 8)
    out[:, 8:12] = np.frombuffer(
        np.full(len(x), wait_for_this_sample, np.uint32).tobytes(),
        np.uint8).reshape(-1, 4)
    return out.reshape(-1)
