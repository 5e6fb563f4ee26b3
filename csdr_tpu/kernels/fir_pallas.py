"""Pallas TPU kernel for the polyphase decimating FIR — THE benchmark kernel
(reference hot loop: fir_decimate_cc, libcsdr.c:528-549; SURVEY.md §3.1).

Design (TPU-first, not a translation):
- The input stream (complex64, already tail-extended by the caller) is viewed
  in *planar polyphase* form: two float32 arrays Xr, Xi of shape (D, Kcat)
  with X[p, k] = x[k*D + p].  XLA produces this with one fused
  bitcast+reshape+transpose pass; the kernel then streams it once at HBM
  speed-of-light.
- Output tile of TK samples per grid step; each step needs slab columns
  [i*TK, i*TK + TK + M - 1) where M = ceil(T/D).  The M-1 halo columns are
  provided as a separately gathered side input so plain BlockSpec pipelining
  (with automatic double-buffering) applies — no manual DMA needed.
- Compute: acc(D, TK) = sum_m slab[:, m:m+TK] * H[m][:, None]; y = sum_p acc.
  All float32 on the VPU: full fp32 accuracy (better than MXU bf16x3) at
  ~2 flops/byte, i.e. memory-bound — the roofline target of BASELINE.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(kout: int) -> int | None:
    for tk in (2048, 1024, 512, 256, 128):
        if kout % tk == 0:
            return tk
    return None


def _fir_poly_kernel(xr_ref, xi_ref, hr_ref, hi_halo_r, hi_halo_i, yr_ref, yi_ref, *, m, tk):
    # refs: xr/xi (D, TK) main slab block; halo (1, D, M-1); taps (M, D) in VMEM
    slab_r = jnp.concatenate([xr_ref[:, :], hi_halo_r[0]], axis=1)
    slab_i = jnp.concatenate([xi_ref[:, :], hi_halo_i[0]], axis=1)
    h = hr_ref[:, :]                       # (M, D)
    d = slab_r.shape[0]
    acc_r = jnp.zeros((d, tk), jnp.float32)
    acc_i = jnp.zeros((d, tk), jnp.float32)
    for mi in range(m):
        hm = h[mi, :][:, None]             # (D, 1)
        acc_r = acc_r + slab_r[:, mi: mi + tk] * hm
        acc_i = acc_i + slab_i[:, mi: mi + tk] * hm
    yr_ref[:, :] = jnp.sum(acc_r, axis=0, keepdims=True)
    yi_ref[:, :] = jnp.sum(acc_i, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("decimation", "kout"))
def _fir_decimate_pallas(xcat_re, xcat_im, taps_mat, decimation: int, kout: int):
    d = decimation
    m = taps_mat.shape[0]
    kcat = xcat_re.shape[0] // d
    tk = _pick_tile(kout)
    # polyphase-transposed views (one fused XLA transpose pass per plane)
    xr = xcat_re.reshape(kcat, d).T        # (D, Kcat)
    xi = xcat_im.reshape(kcat, d).T
    grid = kout // tk
    # halo side inputs: for step i, columns [i*TK+TK, i*TK+TK+M-1)
    halo_idx = (np.arange(grid)[:, None] * tk + tk + np.arange(m - 1)[None, :]).reshape(-1)
    halo_r = xr[:, halo_idx].reshape(d, grid, m - 1).swapaxes(0, 1)  # (grid, D, M-1)
    halo_i = xi[:, halo_idx].reshape(d, grid, m - 1).swapaxes(0, 1)

    kern = functools.partial(_fir_poly_kernel, m=m, tk=tk)
    yr, yi = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((d, tk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, m - 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, m - 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, kout), jnp.float32),
            jax.ShapeDtypeStruct((1, kout), jnp.float32),
        ],
    )(xr[:, : grid * tk], xi[:, : grid * tk], taps_mat, halo_r, halo_i)
    return yr[0], yi[0]


def fir_decimate_pallas_or_fallback(xcat, taps, decimation: int, kout: int,
                                    precision):
    """Dispatch: Pallas polyphase kernel when shapes align, else XLA conv.

    NOTE: superseded in the hot path by the Toeplitz MXU matmul
    (fir_decimate_best), which measures faster at every tap length on this
    chip; the hand-written VPU kernel is retained as the Pallas reference
    implementation for the memory-bound formulation.

    ``xcat`` is a planar CF; its length must satisfy len % D == 0 and provide
    at least kout*D + (M-1)*D samples of slab+halo context (guaranteed by
    fir_decimate_block's round_up(T-1, D) tail).
    """
    from csdr_tpu.core.cplx import CF
    from csdr_tpu.ops.fir import fir_decimate_cc  # local import, avoids cycle

    d = decimation
    t = taps.shape[0]
    m = -(-t // d)
    # m < 2: the halo side input would be a zero-width BlockSpec, which
    # Mosaic cannot lower — the conv fallback handles the T <= D case
    if xcat.shape[0] % d != 0 or m < 2 or jax.default_backend() != "tpu":
        return fir_decimate_cc(xcat, taps, d, precision)[:kout]
    # pad kout up to a full 2048-sample tile: a ragged kout otherwise picks
    # a tiny tile (e.g. 128) and the grid overhead dominates (~10x slower)
    kout_pad = -(-kout // 2048) * 2048
    need = (kout_pad + m - 1) * d
    if xcat.shape[0] < need:
        pad = need - xcat.shape[0]
        xcat = CF(jnp.concatenate([xcat.re, jnp.zeros((pad,), xcat.re.dtype)]),
                  jnp.concatenate([xcat.im, jnp.zeros((pad,), xcat.im.dtype)]))
    taps_mat = jnp.zeros((m * d,), jnp.float32).at[:t].set(taps).reshape(m, d)
    yr, yi = _fir_decimate_pallas(xcat.re, xcat.im, taps_mat, d, kout_pad)
    return CF(yr[:kout], yi[:kout])


# ---------------------------------------------------------------------------
# Toeplitz-matmul decimating FIR — the MXU path for LONG filters
# ---------------------------------------------------------------------------
#
# For T >> D the polyphase windows overlap so heavily that a dense
# "shifted-taps" matrix is nearly free: with an output tile of R=128,
# y[R*j + r] = sum_t x[(R*j+r)*D + t] * h[t] = slab_j @ W where
# slab_j = x[R*j*D : R*j*D + (R-1)*D + T] and W[(r*D + t), r] = h[t].
# W has T/((R-1)*D+T) density — e.g. 45% at T=1023, D=10, R=128 — so the MXU
# does ((R-1)*D+T)/T = 1 + (R-1)*D/T x the ideal MACs: ~2.24x at R=128,
# growing with R (~5.99x at R=512) and shrinking below it (1.30x at R=32) —
# but tiles below 128 pad the MXU's 128-lane N dim, wasting exactly what the
# density saves (bench_roofline.py measures the sweep).  This is the classic
# conv-as-Toeplitz-matmul, profitable exactly where the VPU kernel above
# (memory-bound regime, T/D small) stops being the bottleneck.

def _fir_decimate_toeplitz(x_re, x_im, w, decimation: int, kout: int,
                           precision=jax.lax.Precision.HIGHEST):
    d = decimation
    r = w.shape[1]
    slab_len = w.shape[0]
    assert kout % r == 0
    jn = kout // r
    rd = r * d

    def slabs(x):
        # S[j, :] = x[j*rd : j*rd + slab_len] built from shifted reshapes
        # (layout ops only — a row gather here is catastrophically slow)
        cols = []
        for c in range(-(-slab_len // rd)):
            width = min(rd, slab_len - c * rd)
            seg = jax.lax.dynamic_slice(x, (c * rd,), (jn * rd,)) if c else x[: jn * rd]
            cols.append(seg.reshape(jn, rd)[:, :width])
        return jnp.concatenate(cols, axis=1)

    # ensure x long enough for the shifted reshapes
    need = (-(-slab_len // rd) - 1) * rd + jn * rd
    pad = need - x_re.shape[0]
    if pad > 0:
        x_re = jnp.pad(x_re, (0, pad))
        x_im = jnp.pad(x_im, (0, pad))
    slabs_re = slabs(x_re)                             # (J, slab_len)
    slabs_im = slabs(x_im)
    yr = jnp.dot(slabs_re, w, precision=precision,
                 preferred_element_type=jnp.float32).reshape(-1)
    yi = jnp.dot(slabs_im, w, precision=precision,
                 preferred_element_type=jnp.float32).reshape(-1)
    return yr, yi


@functools.lru_cache(maxsize=64)   # ~1.3 MB/entry: bound it (a retuning
def _toeplitz_w_cached(taps_key, d: int, r: int):   # server designs new taps)
    taps = np.frombuffer(taps_key, np.float32)
    t = len(taps)
    slab_len = (r - 1) * d + t
    w = np.zeros((slab_len, r), np.float32)
    for rr in range(r):
        w[rr * d: rr * d + t, rr] = taps
    return w  # numpy (NOT jnp: a cached device constant would leak tracers)


def _toeplitz_w(taps: np.ndarray, d: int, r: int):
    return _toeplitz_w_cached(np.asarray(taps, np.float32).tobytes(), d, r)


# ---------------------------------------------------------------------------
# VMEM-slab Toeplitz FIR — the roofline kernel
# ---------------------------------------------------------------------------
#
# The XLA Toeplitz path above materializes the slab matrix (J, slab_len) in
# HBM: ~(slab_len/(128*D)) extra round-trips of the whole input (~3.3x at
# T=1023, D=10), which caps it at ~33% of roofline (bench_roofline.py).
# This kernel builds the slabs IN VMEM instead: per grid step it loads a
# contiguous (JB+1, 128*D) window of the polyphase-contiguous input (HBM
# traffic = input read once + halo row), forms the JB overlapping slab rows
# with a shift-concat (VPU layout op), and runs ONE (2*JB, slab_pad) @
# (slab_pad, 128) MXU matmul for both planes.  Requires
# slab_len = 127*D + T <= 2*128*D (i.e. T <= 129*D), which holds for every
# decimator in this framework.

def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fir_vmem_kernel(xm_re, xh_re, xm_im, xh_im, w1_ref,
                     o_re, o_im, *, jb, precision):
    # Slab row r = window rows r, r+1 concatenated; rather than a lane-
    # concat of a sublane-shifted view (Mosaic can't lower the offset
    # layout), the matmul is split at the row boundary:
    #   y = st[:jb] @ W[:rd]  +  st[1:jb+1] @ W[rd:]
    # with the shifted operand produced by pltpu.roll (aligned layout;
    # measured faster than shifting the 128-lane matmul OUTPUT, which
    # forces both dots over the jb+8 halo rows).  The halo block is 8 rows
    # for sublane alignment; only halo row 0 is actually consumed.
    st_re = jnp.concatenate([xm_re[:, :], xh_re[:, :]], axis=0)  # (jb+8, rd)
    st_im = jnp.concatenate([xm_im[:, :], xh_im[:, :]], axis=0)
    _vmem_core(st_re, st_im, w1_ref, o_re, o_im, jb=jb, precision=precision)


def _fir_vmem_shift_kernel(xm_re, xh_re, xm_im, xh_im, ccr, cci,
                           crm_re, crh_re, crm_im, crh_im, w1_ref,
                           o_re, o_im, *, jb, precision):
    """NCO-fused variant (VERDICT r4 #1): mixes the window by
    e^{j*2*pi*(theta0 + rate*s)} IN VMEM before the FIR matmul, so the
    shift costs no HBM round-trip (the reference fuses the same pair in
    libcsdr_gpl.c:126-160 and its NEON hot loops libcsdr.c:352-389 +
    472-524).  Sample s = row*rd + col factors the phasor into
    crow[row] * ccol[col] — two tiny tables; ccol carries the traced
    start phase.  The multiply runs in f32 BEFORE the bf16 split, so
    FIR precision is unchanged and the extra work is pure VPU (the MXU
    is the binding resource at ~76% busy — r4 accounting)."""
    st_re = jnp.concatenate([xm_re[:, :], xh_re[:, :]], axis=0)  # (jb+8, rd)
    st_im = jnp.concatenate([xm_im[:, :], xh_im[:, :]], axis=0)
    ccol_re = ccr[0:1, :]                    # (1, rd) -> sublane broadcast
    ccol_im = cci[0:1, :]
    cr_re = jnp.concatenate([crm_re[:, :], crh_re[:, :]], axis=0)[:, 0:1]
    cr_im = jnp.concatenate([crm_im[:, :], crh_im[:, :]], axis=0)[:, 0:1]
    u_re = st_re * ccol_re - st_im * ccol_im
    u_im = st_re * ccol_im + st_im * ccol_re
    v_re = u_re * cr_re - u_im * cr_im
    v_im = u_re * cr_im + u_im * cr_re
    _vmem_core(v_re, v_im, w1_ref, o_re, o_im, jb=jb, precision=precision)


def _vmem_core(st_re, st_im, w1_ref, o_re, o_im, *, jb, precision):
    up1 = st_re.shape[0] - 1        # roll is non-negative: up-1 == down-(n-1)
    if precision == "HIGH5":
        # Split-first variant: the bf16 hi/lo decomposition runs on the
        # (jb+8, rd) window ONCE, before the roll/concat layout ops —
        # HIGH1..4 split the assembled (2JB, rd+k2) operand, whose rows
        # duplicate the window (a + the rolled b halves), so they convert
        # ~2x the elements.  All layout ops then move bf16 (half the VPU
        # bytes).  Same bf16x3 product as HIGH1: hi@wh + hi@wl + lo@wh.
        sr_hi = st_re.astype(jnp.bfloat16)
        sr_lo = (st_re - sr_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        si_hi = st_im.astype(jnp.bfloat16)
        si_lo = (st_im - si_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        kk = w1_ref.shape[0] // 2          # w1 = [hi; lo] rows, (2K, 128)
        k2 = kk - st_re.shape[1]
        dotb = lambda u, v: jnp.dot(u, v, preferred_element_type=jnp.float32)

        def assemble(pr, pi):
            rr = pltpu.roll(pr, shift=up1, axis=0)
            ri = pltpu.roll(pi, shift=up1, axis=0)
            aa = jnp.concatenate([pr[:jb, :], pi[:jb, :]], axis=0)
            bb = jnp.concatenate([rr[:jb, :k2], ri[:jb, :k2]], axis=0)
            return jnp.concatenate([aa, bb], axis=1)     # (2JB, K) bf16

        ab_hi = assemble(sr_hi, si_hi)
        ab_lo = assemble(sr_lo, si_lo)
        wh, wl = w1_ref[:kk, :], w1_ref[kk:, :]
        y = dotb(ab_hi, wh) + dotb(ab_hi, wl) + dotb(ab_lo, wh)
        o_re[:, :] = y[:jb, :]
        o_im[:, :] = y[jb:, :]
        return
    if precision == "HIGH6":
        # Output-shift variant: split-first bf16 planes (like HIGH5) but
        # NO input-side roll/concat at all — W1 (window row r) and W2 (row
        # r+1, zero-padded k2 -> rd rows) ride one N=256 lane pair, and
        # the up-1 row shift lands on the small f32 OUTPUT tile (2n, 256)
        # instead of the (n, rd) inputs.  The 32-bit output roll lowers on
        # Mosaic (HIGH5's bf16 input roll does not).  MACs +18% vs HIGH1
        # (halo rows ride the dots, W2 pads k2 -> rd); VPU layout bytes
        # ~2.5x lower — a win iff the step is VPU-bound, which the 42.5%
        # MXU / 34% HBM accounting of r2 suggests (bench_roofline.py
        # --variants measures it).
        n = st_re.shape[0]                     # jb + 8
        sr_hi = st_re.astype(jnp.bfloat16)
        sr_lo = (st_re - sr_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        si_hi = st_im.astype(jnp.bfloat16)
        si_lo = (st_im - si_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dotb = lambda u, v: jnp.dot(u, v, preferred_element_type=jnp.float32)
        kk = w1_ref.shape[0] // 2          # w1 = [hi; lo] rows, (2rd, 256)
        wh, wl = w1_ref[:kk, :], w1_ref[kk:, :]
        hi = jnp.concatenate([sr_hi, si_hi], axis=0)        # (2n, rd)
        za = jnp.concatenate([hi, sr_lo, si_lo], axis=0)    # (4n, rd)
        d1 = dotb(za, wh)                                   # (4n, 256)
        y256 = d1[: 2 * n, :] + d1[2 * n:, :] + dotb(hi, wl)
        # row r of the W2 half belongs to output row r-1: shift rows up by
        # one (stays inside each plane: only rows < jb / [n, n+jb) are kept)
        ysh = pltpu.roll(y256, shift=2 * n - 1, axis=0)
        y = y256[:, :128] + ysh[:, 128:]
        o_re[:, :] = y[:jb, :]
        o_im[:, :] = y[n: n + jb, :]
        return
    r_re = pltpu.roll(st_re, shift=up1, axis=0)
    r_im = pltpu.roll(st_im, shift=up1, axis=0)
    a = jnp.concatenate([st_re[:jb, :], st_im[:jb, :]], axis=0)  # (2JB, rd)
    if precision in ("HIGH1", "HIGH2", "HIGH3", "HIGH4"):
        # Mosaic has no Precision.HIGH dot; all four variants compute the
        # same bf16x3 error-compensated product by hand (x = hi + lo bf16
        # split, w likewise; y ~= hi@w_hi + hi@w_lo + lo@w_hi — the w split
        # is exact, so only the x-side lo*lo term is dropped: ~107 dB SNR
        # vs f32 at 1023 taps, ~1.5x the HIGHEST rate).  They differ only
        # in how the three partial products are packed into MXU dot
        # dispatches (bench_roofline.py --variants measures the sweep);
        # `fir_decimate_vmem` maps the public "HIGH" to the winner.
        # In every variant both window halves are fused into ONE operand
        # [a | b[:, :k2]] so each pass is a single large dot (measured +7%
        # over two dots per pass).
        dotb = lambda u, v: jnp.dot(u, v, preferred_element_type=jnp.float32)
        if precision in ("HIGH1", "HIGH3"):
            kk = w1_ref.shape[0] // 2      # w1 = [hi; lo] rows, (2K, 128)
            k2 = kk - a.shape[1]
        else:
            kk = w1_ref.shape[0]           # w1 = [hi | lo] lanes, (K, 256)
            k2 = kk - a.shape[1]
        b = jnp.concatenate([r_re[:jb, :k2], r_im[:jb, :k2]], axis=0)
        ab = jnp.concatenate([a, b], axis=1)          # (2JB, K)
        ab_hi = ab.astype(jnp.bfloat16)
        ab_lo = (ab - ab_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        if precision == "HIGH1":           # r2 baseline: three N=128 dots
            wh, wl = w1_ref[:kk, :], w1_ref[kk:, :]
            y = dotb(ab_hi, wh) + dotb(ab_hi, wl) + dotb(ab_lo, wh)
        elif precision == "HIGH2":         # hi-side passes share an N=256 dot
            y2 = dotb(ab_hi, w1_ref[:, :])            # (2JB, 256)
            y3 = dotb(ab_lo, w1_ref[:, :128])
            y = y2[:, :128] + y2[:, 128:] + y3
        elif precision == "HIGH3":         # wh passes share an M=4JB dot
            wh, wl = w1_ref[:kk, :], w1_ref[kk:, :]
            hl = jnp.concatenate([ab_hi, ab_lo], axis=0)   # (4JB, K)
            y13 = dotb(hl, wh)                             # (4JB, 128)
            y = y13[: 2 * jb, :] + y13[2 * jb:, :] + dotb(ab_hi, wl)
        else:                              # HIGH4: ONE dot, exact bf16x4
            hl = jnp.concatenate([ab_hi, ab_lo], axis=0)   # (4JB, K)
            yq = dotb(hl, w1_ref[:, :])                    # (4JB, 256)
            y = (yq[: 2 * jb, :128] + yq[: 2 * jb, 128:]
                 + yq[2 * jb:, :128] + yq[2 * jb:, 128:])
    else:
        k2 = w1_ref.shape[0] - a.shape[1]
        b = jnp.concatenate([r_re[:jb, :k2], r_im[:jb, :k2]], axis=0)
        ab = jnp.concatenate([a, b], axis=1)          # (2JB, rd+k2)
        prec = getattr(jax.lax.Precision, precision)
        y = jnp.dot(ab, w1_ref[:, :], precision=prec,
                    preferred_element_type=jnp.float32)   # (2*JB, 128)
    o_re[:, :] = y[:jb, :]
    o_im[:, :] = y[jb:, :]


@functools.partial(jax.jit,
                   static_argnames=("decimation", "kout", "jb", "prec_name",
                                    "interp"))
def _fir_decimate_vmem(x_re, x_im, w1, decimation: int, kout: int,
                       jb: int, prec_name: str, interp: bool = False):
    d = decimation
    rd = 128 * d
    jrows = kout // 128
    grid = jrows // jb
    # main rows + the 8 halo rows the last grid step's (8, rd) halo spec
    # reaches (rows [jrows, jrows+8)); this was jrows + jb, which forced
    # the wrapper to zero-pad and copy jb-8 dead rows (163k samples at
    # jb=128) inside every call — a full extra concat pass over the input
    nrows = jrows + 8
    x2_re = x_re[: nrows * rd].reshape(nrows, rd)
    x2_im = x_im[: nrows * rd].reshape(nrows, rd)
    kern = functools.partial(_fir_vmem_kernel, jb=jb, precision=prec_name)
    o_re, o_im = pl.pallas_call(
        kern,
        interpret=interp,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((jb, rd), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, rd), lambda i: (i * (jb // 8) + jb // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((jb, rd), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, rd), lambda i: (i * (jb // 8) + jb // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w1.shape[0], w1.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((jb, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((jb, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((jrows, 128), jnp.float32),
            jax.ShapeDtypeStruct((jrows, 128), jnp.float32),
        ],
        # grid steps are independent: 'arbitrary' lets Mosaic pipeline them
        # (+7% measured); the cost estimate feeds the scheduler
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * w1.shape[0] * kout,
            bytes_accessed=8 * (jrows + 8) * rd, transcendentals=0),
    )(x2_re, x2_re, x2_im, x2_im, w1)
    return o_re.reshape(-1), o_im.reshape(-1)


@functools.partial(jax.jit,
                   static_argnames=("decimation", "kout", "jb", "prec_name",
                                    "interp"))
def _fir_decimate_vmem_shift(x_re, x_im, w1, ccr, cci,
                             crow_re, crow_im, decimation: int, kout: int,
                             jb: int, prec_name: str, interp: bool = False):
    d = decimation
    rd = 128 * d
    jrows = kout // 128
    grid = jrows // jb
    nrows = jrows + 8
    x2_re = x_re[: nrows * rd].reshape(nrows, rd)
    x2_im = x_im[: nrows * rd].reshape(nrows, rd)
    kern = functools.partial(_fir_vmem_shift_kernel, jb=jb,
                             precision=prec_name)
    halo_map = lambda i: (i * (jb // 8) + jb // 8, 0)
    o_re, o_im = pl.pallas_call(
        kern,
        interpret=interp,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((jb, rd), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, rd), halo_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((jb, rd), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, rd), halo_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, rd), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, rd), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((jb, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), halo_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((jb, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), halo_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((w1.shape[0], w1.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((jb, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((jb, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((jrows, 128), jnp.float32),
            jax.ShapeDtypeStruct((jrows, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * w1.shape[0] * kout + 16 * nrows * rd,
            bytes_accessed=8 * nrows * rd + 8 * nrows * 128,
            transcendentals=0),
    )(x2_re, x2_re, x2_im, x2_im, ccr, cci,
      crow_re, crow_re, crow_im, crow_im, w1)
    return o_re.reshape(-1), o_im.reshape(-1)


@functools.lru_cache(maxsize=32)
def _shift_tables_cached(rate: float, rd: int, nrows: int):
    """Static NCO factor tables for the fused kernel (numpy — cached jnp
    constants would leak tracers): crow[r] = e^{2i*pi*frac(rate*rd*r)}
    broadcast to 128 lanes, ccol[c] = e^{2i*pi*frac(rate*c)} tiled to 8
    sublanes (Mosaic block sublane alignment).  Both exact in f64 before
    the f32 store."""
    r = np.arange(nrows, dtype=np.float64)
    crow = np.exp(2j * np.pi * np.mod(np.float64(rate) * rd * r, 1.0))
    c = np.arange(rd, dtype=np.float64)
    ccol = np.exp(2j * np.pi * np.mod(np.float64(rate) * c, 1.0))
    mk = lambda v, w: np.ascontiguousarray(
        np.broadcast_to(v.astype(np.float32)[:, None]
                        if w == 128 else v.astype(np.float32)[None, :],
                        (nrows, 128) if w == 128 else (8, rd)))
    return (mk(crow.real, 128), mk(crow.imag, 128),
            mk(ccol.real, rd), mk(ccol.imag, rd))


def fir_decimate_vmem_shift(xcat, taps, decimation: int, kout: int,
                            rate: float, phase_cycles,
                            precision=jax.lax.Precision.HIGHEST,
                            jb: int | None = None):
    """NCO-shift + VMEM-slab decimating FIR in ONE kernel pass over x
    (reference fusion: decimating_shift_addition_cc libcsdr_gpl.c:126-160;
    NEON pair libcsdr.c:352-389 + 472-524).  Semantics =
    shift_cc(xcat, rate, 2*pi*phase_cycles) then fir_decimate valid-mode:
    sample s of xcat is mixed by e^{j*2*pi*(phase_cycles + rate*s)}.

    rate must be STATIC (the factor tables are host-built); phase_cycles
    is a traced f32 scalar in cycles, folded into the column table with
    one rotation of its 8*rd entries per call."""
    from csdr_tpu.core.cplx import CF

    d = decimation
    t = int(taps.shape[0])
    if jb is None:
        jb = _default_jb(d, t, kout)
    assert jb % 8 == 0 or jb == 8, jb
    kout_pad = _round_up(kout, jb * 128)
    rd = 128 * d
    need = (kout_pad // 128 + 8) * rd
    if xcat.shape[0] < need:
        pad = need - xcat.shape[0]
        xcat = CF(jnp.concatenate([xcat.re, jnp.zeros((pad,), xcat.re.dtype)]),
                  jnp.concatenate([xcat.im, jnp.zeros((pad,), xcat.im.dtype)]))
    prec_name = (precision.name if hasattr(precision, "name")
                 else str(precision))
    if prec_name == "HIGH":
        prec_name = _HIGH_VARIANT
    if prec_name not in ("HIGHEST", "HIGH1", "HIGH2", "HIGH3", "HIGH4",
                         "HIGH6"):
        raise ValueError(
            f"fir_decimate_vmem_shift: precision {prec_name!r} not "
            "validated for the Mosaic dot (DEFAULT wedges the device; "
            "HIGH5 does not lower)")
    from csdr_tpu.kernels.fft_pallas import interpret_mode
    interp = interpret_mode()
    nrows = kout_pad // 128 + 8
    cr_re, cr_im, cc_re, cc_im = _shift_tables_cached(float(rate), rd, nrows)
    # fold the traced start phase into the (tiny) column table: one
    # complex rotation of 8*rd elements per call
    th = 2.0 * np.pi * jnp.asarray(phase_cycles, jnp.float32)
    cth, sth = jnp.cos(th), jnp.sin(th)
    ccr = jnp.asarray(cc_re) * cth - jnp.asarray(cc_im) * sth
    cci = jnp.asarray(cc_re) * sth + jnp.asarray(cc_im) * cth
    w1 = _toeplitz_w_cat_cached(
        np.asarray(taps, np.float32).tobytes(), d, prec_name)
    yr, yi = _fir_decimate_vmem_shift(
        xcat.re, xcat.im, jnp.asarray(w1), ccr, cci,
        jnp.asarray(cr_re), jnp.asarray(cr_im), d, kout_pad, jb,
        prec_name, interp)
    return CF(yr[:kout], yi[:kout])


@functools.lru_cache(maxsize=64)   # multi-MB entries: bound (see above)
def _toeplitz_w_cat_cached(taps_key, d: int, prec_name: str):
    """Wcat = [W[:rd]; W[rd:rd+k2]] (rd+k2, 128) matching the kernel's
    fused [a | b[:, :k2]] operand; k2 = used rows of the second window row
    (rounded to a lane multiple).  For the manual bf16x3 'HIGH' path the
    result is a [hi; lo] bf16 stack of that matrix."""
    taps = np.frombuffer(taps_key, np.float32)
    t = len(taps)
    rd = 128 * d
    slab_len = 127 * d + t
    w = np.zeros((2 * rd, 128), np.float32)
    for rr in range(128):
        w[rr * d: rr * d + t, rr] = taps
    if prec_name == "HIGH6":
        # [W1 | W2pad] lane pair (rd, 256) for the output-shift variant;
        # [hi; lo] rows for the bf16x3 product (the w split is exact)
        import ml_dtypes
        wpair = np.concatenate([w[:rd], w[rd: 2 * rd]], axis=1)
        hi = wpair.astype(ml_dtypes.bfloat16)
        lo = (wpair - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
        return np.concatenate([hi, lo], axis=0)
    k2 = max(128, _round_up(max(slab_len - rd, 1), 128))
    wcat = np.concatenate([w[:rd], w[rd: rd + k2]], axis=0)
    if prec_name in ("HIGH1", "HIGH3", "HIGH5"):   # [hi; lo] stacked along rows
        import ml_dtypes
        hi = wcat.astype(ml_dtypes.bfloat16)
        lo = (wcat - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
        return np.concatenate([hi, lo], axis=0)
    if prec_name in ("HIGH2", "HIGH4"):    # [hi | lo] stacked along lanes
        import ml_dtypes
        hi = wcat.astype(ml_dtypes.bfloat16)
        lo = (wcat - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
        return np.concatenate([hi, lo], axis=1)
    return wcat


# Which dot-packing variant the public "HIGH" precision dispatches to
# (see _fir_vmem_kernel): HIGH1 = three N=128 dots (r2 baseline),
# HIGH2 = hi-side passes share an N=256 dot, HIGH3 = wh passes share an
# M=4JB dot, HIGH4 = one (4JB, K)@(K, 256) dot, HIGH5 = HIGH1 dots with
# the hi/lo split hoisted before the roll/concat layout ops (half the
# converts, bf16 layout traffic).  All compute the same bf16x3 product;
# bench_roofline.py --variants measures the sweep.
#
# HIGH5 does NOT lower on real silicon: Mosaic's tpu.dynamic_rotate is
# 32-bit-only ("Rotate with non-32-bit data"), so pltpu.roll of the bf16
# planes fails to compile — it survives only in interpret-mode coverage.
# HIGH6 (output-shift split-first) lowers and is golden (106.8 dB) but
# loses on silicon (47.8 vs 52.8 Gsps): its +18% MACs exceed the VPU time
# it saves now that the MXU is ~76% busy.
# On-chip sweep (2026-08-19, D=10 T=1023 kout=262k, 'dus' timing):
# HIGH3/jb=256 52.8 Gsps > HIGH1/128 52.2 ~ HIGH2/256 52.1 > HIGH4 42.6;
# head-to-head re-runs confirm HIGH3/256 on top (52.4/53.0 vs 52.0/52.3).
# HIGH3/jb=256 (deep grids) is the production dispatch.
_HIGH_VARIANT = "HIGH3"


def _vmem_jb_cap(d: int, t: int) -> int:
    """Largest jb (rows per grid step) whose resident VMEM fits the ~16 MB
    core budget, or <8 when even jb=8 cannot fit (caller must fall back to
    the XLA Toeplitz path).

    Per-step residents, with Mosaic's double-buffering of grid blocks:
    two (jb, rd) f32 input blocks + two (8, rd) halo blocks (x2 for the
    double buffer), the whole-kernel weight matrix (rd+k2, 128) f32 — the
    bf16 [hi;lo] HIGH stack is byte-identical — and two (jb, 128) f32
    output blocks.  The jb=128 default was swept only at d=10 (ADVICE r2);
    deep-d configs must shrink jb or overflow VMEM."""
    rd = 128 * d
    slab_len = 127 * d + t
    k2 = max(128, _round_up(max(slab_len - rd, 1), 128))
    w_bytes = (rd + k2) * 128 * 4
    halo_bytes = 2 * 2 * 8 * rd * 4          # dbl-buf x re/im (8, rd) specs
    budget = 14 * 2**20 - w_bytes - halo_bytes
    per_row = 2 * 2 * rd * 4 + 2 * 2 * 128 * 4   # dbl-buf in + out rows
    cap = budget // per_row if budget > 0 else 0
    return min(256, (cap // 8) * 8)


def vmem_min_t() -> int:
    """Minimum tap length for the VMEM-slab dispatch in fir_decimate_best
    (CSDR_FIR_VMEM_MIN_T, default 512).  At short taps the standalone vmem
    kernel beats the XLA Toeplitz path (T=81: 36.8 vs 27.6 Gsps at deep
    grids, HIGH) but historically lost INSIDE a jitted chain where the
    opaque pallas boundary forfeits XLA's fusion of neighboring stages;
    the zero-concat block split (ops/fir.fir_decimate_block) removed those
    neighbors for chain-head FIRs, so the gate is env-tunable for
    in-context A/B."""
    import os
    try:
        return int(os.environ.get("CSDR_FIR_VMEM_MIN_T", "512"))
    except ValueError:
        return 512


def _default_jb(d: int, t: int, kout: int) -> int:
    """jb default: the swept deep-grid winner (256 at kout>=262k with
    HIGH3, else 128), shrunk for small grids (matmul M-dim vs
    tile-rounding pad) and VMEM-capped at deep d."""
    cap = _vmem_jb_cap(d, t)
    if cap < 8:
        raise ValueError(
            f"fir_decimate_vmem: D={d} T={t} exceeds the VMEM budget "
            "even at jb=8 (weights alone ~"
            f"{(128 * d + 127 * d + t) * 512 // 2**20} MB); use "
            "fir_decimate_best's XLA Toeplitz path")
    return min(cap,
               256 if kout >= 2048 * 128 else
               128 if kout >= 128 * 128 else
               64 if kout >= 64 * 128 else 8)


def fir_decimate_vmem(xcat, taps, decimation: int, kout: int,
                      precision=jax.lax.Precision.HIGHEST,
                      jb: int | None = None):
    """VMEM-slab decimating FIR.  Caller guarantees TPU backend and
    T <= 129*D; pads kout to a whole grid of JB*128 outputs.

    jb: rows (output 128-sample tiles) per grid step — the M dim of the
    per-step MXU dots is 2*jb (4*jb for the stacked HIGH variants).
    Default 128 at deep grids; bench_roofline.py --variants sweeps it."""
    from csdr_tpu.core.cplx import CF

    d = decimation
    t = int(taps.shape[0])
    # Bigger per-step matmuls beat padding waste: jb=64 beat jb=16 even at
    # 25% tile-rounding pad (bench_kernels' 26214-output shape: 14.9 vs
    # 13.9 Gsps), and the on-chip sweep (2026-08-19) ranks jb=128 over 64
    # over 32 at every HIGH packing (29.1 / 27.9 / 27.3 Gsps for HIGH1).
    if jb is None:
        jb = _default_jb(d, t, kout)
    assert jb % 8 == 0 or jb == 8, jb
    kout_pad = _round_up(kout, jb * 128)
    rd = 128 * d
    # input needed: main rows (kout_pad/128) + the 8-row halo block, each rd
    need = (kout_pad // 128 + 8) * rd
    if xcat.shape[0] < need:
        pad = need - xcat.shape[0]
        xcat = CF(jnp.concatenate([xcat.re, jnp.zeros((pad,), xcat.re.dtype)]),
                  jnp.concatenate([xcat.im, jnp.zeros((pad,), xcat.im.dtype)]))
    prec_name = (precision.name if hasattr(precision, "name")
                 else str(precision))
    if prec_name == "HIGH":
        prec_name = _HIGH_VARIANT   # measured winner of the dot-packing sweep
    if prec_name not in ("HIGHEST", "HIGH1", "HIGH2", "HIGH3", "HIGH4",
                         "HIGH5", "HIGH6"):
        # the DEFAULT-precision Mosaic dot is a KNOWN axon device-wedger
        # (CLAUDE.md); only the validated packings may reach the kernel
        raise ValueError(
            f"fir_decimate_vmem: precision {prec_name!r} not validated for "
            "the Mosaic dot (DEFAULT wedges the device); use HIGHEST/HIGH "
            "or the XLA Toeplitz path (fir_decimate_best)")
    # interpret mode is part of the jit cache key: an env toggle must never
    # silently reuse a trace of the other mode
    import os
    from csdr_tpu.kernels.fft_pallas import interpret_mode
    interp = interpret_mode()
    if (prec_name == "HIGH5" and not interp
            and jax.default_backend() == "tpu"):
        # Mosaic's dynamic_rotate is 32-bit-only: the bf16-plane roll in
        # HIGH5 fails to lower on silicon (and a crashed Mosaic compile can
        # wedge the axon tunnel) — fail fast like the DEFAULT guard.
        raise ValueError(
            "fir_decimate_vmem: HIGH5 does not lower on TPU silicon "
            "(Mosaic dynamic_rotate is 32-bit-only); use HIGH/HIGH1, or "
            "interpret mode for coverage")
    w1 = _toeplitz_w_cat_cached(
        np.asarray(taps, np.float32).tobytes(), d, prec_name)
    yr, yi = _fir_decimate_vmem(xcat.re, xcat.im, jnp.asarray(w1),
                                d, kout_pad, jb, prec_name, interp)
    return CF(yr[:kout], yi[:kout])


def fir_decimate_best(xcat, taps, decimation: int, kout: int,
                      precision=jax.lax.Precision.HIGHEST,
                      tile_r: int = 128):
    """Kernel dispatch: MXU Toeplitz matmul on TPU (measured fastest at ALL
    tap lengths on this hardware — ~50 Gsps at 81 taps, ~20 Gsps at 1023
    taps, despite the W-matrix density waste at short taps; the VPU
    polyphase Pallas kernel tops out ~28x lower), XLA conv elsewhere.

    precision: HIGHEST (default) holds ~128 dB SNR vs the reference C;
    Precision.HIGH is ~43% faster at long taps (~98 dB SNR) when the
    pipeline tolerates bf16x3 accumulation.

    tile_r: Toeplitz output tile (the matmul's N dim).  MAC overhead is
    1 + (tile_r-1)*D/T — smaller tiles are denser but pad the MXU's
    128-lane N dimension; 128 is both the densest full-lane tile and the
    measured optimum (bench_roofline.py sweeps it).
    """
    from csdr_tpu.core.cplx import CF
    from csdr_tpu.ops.fir import fir_decimate_cc

    d = decimation
    t = taps.shape[0]
    if jax.default_backend() != "tpu":
        return fir_decimate_cc(xcat, taps, d, precision)[:kout]
    # VMEM-slab pallas kernel when the slab fits a 2-row window and the
    # window rows fit VMEM (T <= 129*D, 128*D lanes <= 16K): no HBM slab
    # materialization.  Gated to the MXU-bound LONG-tap regime: at short
    # taps the standalone kernel can still win at deep grids (T=81: 36.8
    # vs 27.6 Gsps at kout=240k, HIGH) but INSIDE a jitted chain the
    # opaque pallas boundary forfeits XLA's fusion of neighboring stages
    # and measured a net loss (WFM advanced 8.9 -> 6.8 Gsps), so only
    # t >= 512 dispatches here.  Only the validated HIGHEST /
    # manual-bf16x3 HIGH variants run in pallas; other precisions (e.g.
    # DEFAULT turbo) take the XLA Toeplitz path — the DEFAULT-precision
    # Mosaic dot was observed to wedge the device.
    prec_ok = precision in (jax.lax.Precision.HIGHEST,
                            jax.lax.Precision.HIGH)
    if (prec_ok and vmem_min_t() <= t <= 129 * d and 128 * d <= 16384
            and kout >= 1024 and _vmem_jb_cap(d, t) >= 8):
        return fir_decimate_vmem(xcat, taps, d, kout, precision)
    # round kout up to the Toeplitz kernel's tile_r-row tile, zero-padding
    # the input as needed: the padded tail costs <1 tile of work, while the
    # conv fallback for a ragged kout is ~100x slower at long taps
    kout_pad = -(-kout // tile_r) * tile_r
    need = (kout_pad - 1) * d + t
    if xcat.shape[0] < need:
        pad = need - xcat.shape[0]
        xcat = CF(jnp.concatenate([xcat.re, jnp.zeros((pad,), xcat.re.dtype)]),
                  jnp.concatenate([xcat.im, jnp.zeros((pad,), xcat.im.dtype)]))
    # W must be built from CONCRETE taps (host-side); taps captured as a
    # constant in the enclosing trace are still concrete here.
    w = _toeplitz_w(np.asarray(taps), d, tile_r)
    yr, yi = _fir_decimate_toeplitz(xcat.re, xcat.im, w, d, kout_pad, precision)
    return CF(yr[:kout], yi[:kout])
