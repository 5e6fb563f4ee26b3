"""Pallas TPU kernel for the fastddc factored-v2 inverse (ROADMAP #4).

Reference semantics: fastddc.c:106-166 (taps multiply + bin fold + iFFT +
scrap + decimating NCO per channel).  The fused dense matrix
(ops/fastddc.channel_fused_matrix) executes ~fft/(inv + fft/M) x the
algorithmic MACs (~8x at D=16) because the fold's j-sparsity cannot ride a
dense MXU matmul.  The factored-v2 algebra (channel_factored2_arrays)
removes the per-channel iDFT roll via the roll-to-diagonal identity, so the
inverse is:

    fold (VPU, exact f32):  Z[b,c,m] = sum_j S[b, j*inv+m] * TQ[c,j,m]
    NCO   (VPU):            Z[b,c,:] *= rot[c,b]        (per-frame phase)
    iDFT  (MXU, shared):    Y[b,c,:] = Z[b,c,:] @ W     one dot for ALL c
    diag  (VPU):            out[c,b,o] = Y[b,c,o] * d[c,o]

This kernel runs the whole chain in VMEM per (frame-tile x channel-tile)
grid step: the Z intermediate (67 MB/chunk at D=16, B=1024, C=64 — the
round-trip that killed the r2 XLA factored path) never touches HBM, and the
output is written once in its final (C, B, M) layout.

Constraints honored (see CLAUDE.md "TPU/axon gotchas"): no Mosaic HIGH dot
(manual bf16x3 with an exact W split), lane slices only at 128-multiples
(W packed [wr | wi] with mpad=128), sublane dims multiples of 8.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def kernel_enabled() -> bool:
    """CSDR_FASTDDC_KERNEL=0 disables the VMEM factored-v2 inverse kernel
    globally: fastddc_inv_block falls back to the fused dense-matrix
    inverse (same linear map, the mid-r2 measured configuration).
    Mirrors CSDR_FFT_KERNEL —
    bench.py flips both off when the on-chip validation marker
    (ONCHIP_VALIDATED.json) is absent, so a never-run-on-silicon Mosaic
    kernel cannot wedge the driver bench.  Set BEFORE building plans;
    flipping mid-process leaves already-jitted callables on their path."""
    return os.environ.get("CSDR_FASTDDC_KERNEL", "1") != "0"


def _inv_kernel(s_re, s_im, tq_re, tq_im, rot_re, rot_im, d_re, d_im,
                w_ref, o_re, o_im, *, pre, inv, cb, bt, m_out, prec):
    # fold: Z[c,b,m] = sum_j S[b, j*inv+m] * TQ[c,j,m]   (complex, f32 VPU)
    zr = jnp.zeros((cb, bt, inv), jnp.float32)
    zi = jnp.zeros((cb, bt, inv), jnp.float32)
    for j in range(pre):
        sr = s_re[:, j * inv:(j + 1) * inv][None, :, :]   # (1, bt, inv)
        si = s_im[:, j * inv:(j + 1) * inv][None, :, :]
        tr = tq_re[:, j, :][:, None, :]                   # (cb, 1, inv)
        ti = tq_im[:, j, :][:, None, :]
        zr = zr + sr * tr - si * ti
        zi = zi + sr * ti + si * tr
    # per-frame NCO: a complex scalar per (c, b) row — applied before the
    # shared dot (scaling commutes with the linear iDFT)
    rr = rot_re[:, :][:, :, None]
    ri = rot_im[:, :][:, :, None]
    zr, zi = zr * rr - zi * ri, zr * ri + zi * rr
    a = jnp.concatenate([zr.reshape(cb * bt, inv),
                         zi.reshape(cb * bt, inv)], axis=0)  # (2*cb*bt, inv)
    half = cb * bt
    mpad = w_ref.shape[-1] // 2
    if prec == "HIGH":
        # manual bf16x3: W pre-split [hi; lo] rows (exact split host-side);
        # only a's lo*lo term is dropped
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        wh, wl = w_ref[:inv, :], w_ref[inv:, :]
        dotb = lambda u, v: jnp.dot(u, v, preferred_element_type=jnp.float32)
        y = dotb(a_hi, wh) + dotb(a_hi, wl) + dotb(a_lo, wh)
    else:
        y = jnp.dot(a, w_ref[:, :], precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)     # (2cbbt, 2mpad)
    yrr = y[:half, :mpad]          # zr @ wr
    yri = y[:half, mpad:]          # zr @ wi
    yir = y[half:, :mpad]          # zi @ wr
    yii = y[half:, mpad:]          # zi @ wi
    y_re = (yrr - yii).reshape(cb, bt, mpad)
    y_im = (yri + yir).reshape(cb, bt, mpad)
    # per-channel output diagonal (roll factor x in-frame NCO)
    dr = d_re[:, :][:, None, :]
    di = d_im[:, :][:, None, :]
    out_re = y_re * dr - y_im * di
    out_im = y_re * di + y_im * dr
    o_re[:, :, :] = out_re[:, :, :m_out]
    o_im[:, :, :] = out_im[:, :, :m_out]


@functools.partial(
    jax.jit, static_argnames=("pre", "inv", "m_out", "bt", "cb", "prec",
                              "interp"))
def _inv_vmem(s_re, s_im, tq_re, tq_im, rot_re, rot_im, d_re, d_im, w1,
              pre: int, inv: int, m_out: int, bt: int, cb: int, prec: str,
              interp: bool = False):
    b = s_re.shape[0]
    c = tq_re.shape[0]
    grid = (b // bt, c // cb)      # channel axis innermost: S block cached
    kern = functools.partial(_inv_kernel, pre=pre, inv=inv, cb=cb, bt=bt,
                             m_out=m_out, prec=prec)
    mpad2 = w1.shape[-1]
    o_re, o_im = pl.pallas_call(
        kern,
        interpret=interp,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, pre * inv), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, pre * inv), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, pre, inv), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, pre, inv), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, bt), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, bt), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, mpad2 // 2), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, mpad2 // 2), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w1.shape, lambda i, j: tuple(0 for _ in w1.shape),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((cb, bt, m_out), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, bt, m_out), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, b, m_out), jnp.float32),
            jax.ShapeDtypeStruct((c, b, m_out), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            # fold (8 flops per complex MAC) + shared dot
            flops=8 * b * c * pre * inv + 8 * b * c * inv * (mpad2 // 2),
            bytes_accessed=8 * b * pre * inv + 8 * c * b * m_out,
            transcendentals=0),
    )(s_re, s_im, tq_re, tq_im, rot_re, rot_im, d_re, d_im, w1)
    return o_re, o_im


def pack_w(w: np.ndarray, prec: str, mpad: int | None = None):
    """Host-side W packing: complex (inv, M) -> [wr | wi] lanes, each padded
    to ``mpad`` (default: M rounded up to a 128-lane multiple — a fixed 128
    would silently overlap the wi half for M > 128 plans like D=4's m=224);
    for the manual-bf16x3 HIGH path an exact [hi; lo] row stack in bf16."""
    inv, m = w.shape
    if mpad is None:
        mpad = max(128, _round_up(m, 128))
    if m > mpad:
        raise ValueError(f"pack_w: m={m} exceeds mpad={mpad}")
    wcat = np.zeros((inv, 2 * mpad), np.float32)
    wcat[:, :m] = w.real
    wcat[:, mpad:mpad + m] = w.imag
    if prec == "HIGH":
        import ml_dtypes
        hi = wcat.astype(ml_dtypes.bfloat16)
        lo = (wcat - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
        return np.concatenate([hi, lo], axis=0)
    return wcat


def pick_tiles(b: int, c: int, pre: int | None = None,
               inv: int | None = None):
    """(bt, cb) grid tiles, or None when the chunk OR plan shape can't ride
    the kernel (fall back to the XLA path).  bt=128 keeps the rot blocks
    lane-aligned; cb=8 bounds the per-step VMEM Z slab.

    Plan guard (pass the tq dims): the fold slices S at inv-lane boundaries
    and the tq blocks carry sublane dim ``pre`` — Mosaic wants lane slices
    at 128-multiples and sublane dims at 8-multiples, so plans like
    D=4 (pre=2) or D=256 (inv=16) route to the XLA factored path instead
    of risking an unlowerable kernel."""
    if pre is not None and pre % 8 != 0:
        return None
    if inv is not None and inv % 128 != 0:
        return None
    if b % 128 == 0:
        bt = 128
    elif b % 64 == 0 and b >= 64:
        # rot blocks go sub-128-lane here; still lowers, measured slower —
        # only used for mid-size chunks
        bt = 64
    else:
        return None
    for cb in (8, 4, 2, 1):
        if c % cb == 0:
            return bt, cb
    return None


def fastddc_inv_vmem(spectra, tq, w1, d, rot, m_out: int, prec: str):
    """VMEM factored-v2 inverse.  spectra CF (B, fft); tq CF (C, pre, inv);
    w1 packed ndarray from pack_w; d CF (C, mpad); rot CF (C, B) per-frame
    NCO rotation.  Returns CF (C, B, m_out).  Caller should gate on
    pick_tiles(B, C, pre, inv); the full guard (incl. the plan-shape
    sublane/lane rules) is re-checked here so an unlowerable Mosaic kernel
    can never be attempted."""
    from csdr_tpu.core.cplx import CF

    c, pre, inv = tq.re.shape
    b = spectra.re.shape[0]
    tiles = pick_tiles(b, c, pre, inv)
    if tiles is None:
        raise ValueError(
            f"fastddc_inv_vmem: shape not kernel-tileable (B={b}, C={c}, "
            f"pre={pre}, inv={inv}) — gate on pick_tiles(...) and use the "
            "XLA factored path")
    bt, cb = tiles
    # interpret mode rides the jit cache key so an env toggle can never
    # silently reuse a trace of the other mode
    from csdr_tpu.kernels.fft_pallas import interpret_mode
    interp = interpret_mode()
    o_re, o_im = _inv_vmem(spectra.re, spectra.im, tq.re, tq.im,
                           rot.re, rot.im, d.re, d.im, jnp.asarray(w1),
                           pre, inv, m_out, bt, cb, prec, interp)
    return CF(o_re, o_im)
