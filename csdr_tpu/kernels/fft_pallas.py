"""VMEM-resident matmul FFT — the TPU production transform for batched
power-of-two FFTs (reference backend: fft_fftw.c:6-45; sizes are always
next_pow2, csdr.c:1833-1837, fastddc.c:52).

The XLA Stockham path (core/fft.py) round-trips part of the array through
HBM every one of the log2(N) stages (measured 200-300 GB/s effective I/O,
27-40%% of this chip's read bandwidth).  This kernel reads each frame into
VMEM ONCE and does the whole transform on-chip:

- Input is the natural lane-major ``(B, N)`` frame layout.  N splits into
  T = N/128 lane tiles; n = 128*t + l.
- **Across-tile stages** (VPU): log2(T) radix-2 DIF butterflies on the
  *tile* axis.  Tiles are 128-lane static slices and the stage twiddles are
  complex *scalars* per tile pair — no reshapes, no lane shuffles, nothing
  the Mosaic lowering can't express (the per-stage interleave that blocks a
  direct Stockham port disappears entirely).
- **Per-tile DFT** (MXU): after the stages, tile slot j needs an
  independent 128-point DFT with a per-lane twiddle — folded host-side
  into one (128, 128) matrix F_j per tile, so the hot op is a perfect
  (2*Bt, 128) @ (128, 128) matmul per tile.
- **Deferred digit reversal**: the result lands in *kernel bin order*
  (lane 128*j + u holds bin k = T*u + bitrev(j)).  Instead of a lane
  transpose, the permutation is folded into the consumer: spectral
  matrices index permuted rows (fastddc), H masks permute host-side
  (fftfilt), and the matching INVERSE kernel consumes kernel order
  natively (matmul first, then the inverted butterfly network) and emits
  natural order — so fwd->pointwise->inv pipelines never reorder at all.
  ``kernel_perm(n)`` gives natural = kernelorder[perm] for everything else.

Precision: "HIGH" runs the matmuls as a manual bf16 hi/lo 3-dot expansion
(Mosaic has no Precision.HIGH dot; the same expansion as the FIR VMEM
kernel, ~107 dB), "HIGHEST" as f32 6-pass dots.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from csdr_tpu.core.cplx import CF

LANE = 128


def _bitrev(i: int, bits: int) -> int:
    r = 0
    for _ in range(bits):
        r = (r << 1) | (i & 1)
        i >>= 1
    return r


def supported(n: int, b: int) -> bool:
    """Shapes this kernel handles: N = 128..16384 power of two, any B>0
    (frames pad to the sublane tile).  N <= 2048 folds the per-tile
    twiddles into T DFT matrices; larger N shares ONE F128 and applies the
    twiddles as per-slab lane cmuls (the folded matrices would not fit
    VMEM).

    CSDR_FFT_KERNEL=0 disables the kernel globally: every consumer that
    gates on supported() (fft_cc, fftfilt, the fastddc fwd/classed paths)
    falls back coherently to the Stockham FFT + an order gather.  Set it
    BEFORE the process builds any plan — flipping it mid-process leaves
    already-jitted callables on their original path."""
    if os.environ.get("CSDR_FFT_KERNEL", "1") == "0":
        return False
    if n < LANE or n > 16384 or (n & (n - 1)):
        return False
    return b > 0


def interpret_mode() -> bool:
    """CSDR_PALLAS_INTERPRET: run pallas kernels through the interpreter
    (CPU test coverage).  "0" and "" mean OFF — consistent with
    CSDR_FFT_KERNEL=0, unlike raw string truthiness."""
    return os.environ.get("CSDR_PALLAS_INTERPRET", "") not in ("", "0")


def use_kernel(n: int, b: int) -> bool:
    """The gate every matmul-FFT consumer shares: TPU backend (or
    interpret-mode testing) AND a plan supported() handles."""
    import jax
    return ((jax.default_backend() == "tpu" or interpret_mode())
            and supported(n, b))


def kernel_perm(n: int) -> np.ndarray:
    """perm with natural[k] = kernelorder[perm[k]] (numpy int32)."""
    t = n // LANE
    bits = int(np.log2(t))
    perm = np.empty(n, np.int32)
    for j in range(t):
        r = _bitrev(j, bits)
        for u in range(LANE):
            perm[t * u + r] = LANE * j + u
    return perm


@functools.lru_cache(maxsize=None)
def _fwd_mats(n: int, sign: int):
    """Per-tile DFT matrices F_j (T, 128, 128) c128 host math, f32 planes.
    F_j[l, u] = w_N^(l*r_j) * w_128^(l*u), r_j = bitrev(j)."""
    t = n // LANE
    bits = int(np.log2(t))
    l = np.arange(LANE)
    f = np.empty((t, LANE, LANE), np.complex128)
    base = np.exp(sign * 2j * np.pi * np.outer(l, l) / LANE)
    for j in range(t):
        r = _bitrev(j, bits)
        twl = np.exp(sign * 2j * np.pi * l * r / n)
        f[j] = twl[:, None] * base
    return np.ascontiguousarray(f.real.astype(np.float32)), \
        np.ascontiguousarray(f.imag.astype(np.float32))


@functools.lru_cache(maxsize=None)
def _inv_mats(n: int, sign: int):
    """Per-tile matrices for the inverse (input in kernel order):
    G_j[u, l] = w_128^(-s*u*l)... with sign=+1: G_j = conj(F128) scaled by
    conj(tw) columns; unnormalized (the 1/N stays with the caller)."""
    t = n // LANE
    bits = int(np.log2(t))
    l = np.arange(LANE)
    g = np.empty((t, LANE, LANE), np.complex128)
    base = np.exp(sign * 2j * np.pi * np.outer(l, l) / LANE)
    for j in range(t):
        r = _bitrev(j, bits)
        twl = np.exp(sign * 2j * np.pi * l * r / n)
        g[j] = base * twl[None, :]
    return np.ascontiguousarray(g.real.astype(np.float32)), \
        np.ascontiguousarray(g.imag.astype(np.float32))


def _split_bf16(a: np.ndarray):
    import ml_dtypes
    hi = a.astype(ml_dtypes.bfloat16)
    lo = (a - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


def _shared(n: int) -> bool:
    """Above 2048 the T folded (128,128) matrices outgrow VMEM; share one
    F128 base and apply the per-tile twiddle as a lane cmul instead."""
    return n > 2048


@functools.lru_cache(maxsize=None)
def _mats_packed(n: int, sign: int, inverse: bool, precision: str):
    """Returns (f_re, f_im, tw_re, tw_im).  Folded mode (tw=None): f are
    (T, 128, 128) per-tile matrices.  Shared mode: f are the ONE (128,128)
    base DFT matrix (leading tile axis of size 1) and tw are (T, 128) f32
    twiddle planes (tw_j[l] = w_N^(l * bitrev(j)))."""
    if not _shared(n):
        fr, fi = (_inv_mats if inverse else _fwd_mats)(n, sign)
        tw = (None, None)
    else:
        l = np.arange(LANE)
        base = np.exp(sign * 2j * np.pi * np.outer(l, l) / LANE)
        fr = base.real.astype(np.float32)[None]
        fi = base.imag.astype(np.float32)[None]
        t = n // LANE
        bits = int(np.log2(t))
        twc = np.empty((t, LANE), np.complex128)
        for j in range(t):
            twc[j] = np.exp(sign * 2j * np.pi * l * _bitrev(j, bits) / n)
        tw = (twc.real.astype(np.float32), twc.imag.astype(np.float32))
    if precision == "HIGH":
        frh, frl = _split_bf16(fr)
        fih, fil = _split_bf16(fi)
        # (T or 1, 2*128, 128) stacks: rows [hi; lo]
        fr = np.concatenate([frh, frl], axis=1)
        fi = np.concatenate([fih, fil], axis=1)
    return fr, fi, tw[0], tw[1]


def _dot_tile(ar, ai, f_re, f_im, precision: str):
    """Complex (2Bt-stacked) x (128,128) tile product.
    ar/ai (Bt, 128) f32; f_re/f_im (128,128) f32 or (256,128) bf16 [hi;lo].
    Returns (yr, yi)."""
    bt = ar.shape[0]
    x2 = jnp.concatenate([ar, ai], axis=0)            # (2Bt, 128)
    if precision == "HIGH":
        dotb = lambda u, v: jnp.dot(u, v, preferred_element_type=jnp.float32)
        x2h = x2.astype(jnp.bfloat16)
        x2l = (x2 - x2h.astype(jnp.float32)).astype(jnp.bfloat16)
        kk = LANE
        ydr = (dotb(x2h, f_re[:kk]) + dotb(x2h, f_re[kk:])
               + dotb(x2l, f_re[:kk]))
        ydi = (dotb(x2h, f_im[:kk]) + dotb(x2h, f_im[kk:])
               + dotb(x2l, f_im[:kk]))
    else:
        prec = jax.lax.Precision.HIGHEST
        ydr = jnp.dot(x2, f_re, precision=prec,
                      preferred_element_type=jnp.float32)
        ydi = jnp.dot(x2, f_im, precision=prec,
                      preferred_element_type=jnp.float32)
    # (ar + i ai) @ (F_re + i F_im)
    yr = ydr[:bt] - ydi[bt:]
    yi = ydi[:bt] + ydr[bt:]
    return yr, yi


def _stage_tw(span: int, h: int, sign: int):
    return np.exp(sign * 2j * np.pi * np.arange(h) / span)


def _tile_mats(fr_ref, fi_ref, j: int):
    """Per-tile matrix planes: folded mode indexes tile j, shared mode
    always uses the single base matrix."""
    jj = j if fr_ref.shape[0] > 1 else 0
    return fr_ref[jj], fi_ref[jj]


def _fft_fwd_kernel(xr_ref, xi_ref, fr_ref, fi_ref, *rest,
                    t, sign, precision, shared):
    # pallas passes inputs then outputs: [twr, twi,] or_ref, oi_ref
    if shared:
        tw_refs, (or_ref, oi_ref) = rest[:2], rest[2:]
    else:
        tw_refs, (or_ref, oi_ref) = (), rest
    slabs = [(xr_ref[:, LANE * j: LANE * (j + 1)],
              xi_ref[:, LANE * j: LANE * (j + 1)]) for j in range(t)]
    # across-tile DIF (tile-axis butterflies, scalar twiddles)
    span = t
    while span > 1:
        h = span // 2
        tw = _stage_tw(span, h, sign)
        nxt = [None] * t
        for g in range(t // span):
            for i in range(h):
                (tr, ti) = slabs[g * span + i]
                (br, bi) = slabs[g * span + i + h]
                c = tw[i]
                dr, di = tr - br, ti - bi
                nxt[g * span + i] = (tr + br, ti + bi)
                if c == 1.0 + 0.0j:
                    nxt[g * span + i + h] = (dr, di)
                else:
                    cre, cim = float(c.real), float(c.imag)
                    nxt[g * span + i + h] = (dr * cre - di * cim,
                                             dr * cim + di * cre)
        slabs = nxt
        span = h
    # per-tile DFT matmuls; write kernel-order slabs
    for j in range(t):
        ar, ai = slabs[j]
        if shared:
            # (1, 128) row slices: keep operands 2-D for the Mosaic
            # broadcast (1-D lane vectors are a lowering risk)
            twr = tw_refs[0][j: j + 1, :]
            twi = tw_refs[1][j: j + 1, :]
            ar, ai = (ar * twr - ai * twi, ar * twi + ai * twr)
        fr, fi = _tile_mats(fr_ref, fi_ref, j)
        yr, yi = _dot_tile(ar, ai, fr, fi, precision)
        or_ref[:, LANE * j: LANE * (j + 1)] = yr
        oi_ref[:, LANE * j: LANE * (j + 1)] = yi


def _fft_inv_kernel(xr_ref, xi_ref, fr_ref, fi_ref, *rest,
                    t, sign, precision, shared):
    if shared:
        tw_refs, (or_ref, oi_ref) = rest[:2], rest[2:]
    else:
        tw_refs, (or_ref, oi_ref) = (), rest
    # per-tile matmuls first (input arrives in kernel order)
    slabs = []
    for j in range(t):
        ar = xr_ref[:, LANE * j: LANE * (j + 1)]
        ai = xi_ref[:, LANE * j: LANE * (j + 1)]
        fr, fi = _tile_mats(fr_ref, fi_ref, j)
        yr, yi = _dot_tile(ar, ai, fr, fi, precision)
        if shared:
            # inverse per-tile matrix = base with COLUMN scaling by tw:
            # apply after the shared-base dot ((1, 128) rows, see fwd)
            twr = tw_refs[0][j: j + 1, :]
            twi = tw_refs[1][j: j + 1, :]
            yr, yi = (yr * twr - yi * twi, yr * twi + yi * twr)
        slabs.append((yr, yi))
    # inverted butterfly network: stages in reverse, conj twiddles,
    # halving folded out (unnormalized inverse)
    span = 2
    while span <= t:
        h = span // 2
        tw = _stage_tw(span, h, sign)
        nxt = [None] * t
        for g in range(t // span):
            for i in range(h):
                (tr, ti) = slabs[g * span + i]
                (br, bi) = slabs[g * span + i + h]
                c = tw[i]
                if c == 1.0 + 0.0j:
                    btr, bti = br, bi
                else:
                    cre, cim = float(c.real), float(c.imag)
                    btr = br * cre - bi * cim
                    bti = br * cim + bi * cre
                nxt[g * span + i] = (tr + btr, ti + bti)
                nxt[g * span + i + h] = (tr - btr, ti - bti)
        slabs = nxt
        span *= 2
    for j in range(t):
        yr, yi = slabs[j]
        or_ref[:, LANE * j: LANE * (j + 1)] = yr
        oi_ref[:, LANE * j: LANE * (j + 1)] = yi


def _pick_bt(n: int, b: int) -> int:
    """Frames per grid step: in+out blocks double-buffered are ~16*Bt*N
    bytes of VMEM, so cap Bt*N at 512K elements (8 MB) and Bt at 128.

    Prefer a LARGE exact divisor (>= 32: per-step dots are M=2*bt rows and
    skinny-M dots waste the MXU — CLAUDE.md); otherwise take the largest
    power-of-two tile that doesn't exceed the batch and PAD b up to it
    (the caller already pads): b=2500 runs bt=128 with 2.4%% padding and
    b=1000 pads to 1024 rather than running 125 M=16-row steps."""
    cap = max(8, min(128, (1 << 19) // n))
    for bt in (128, 64, 32):
        if bt <= cap and b % bt == 0:
            return bt
    b_pow2 = 1 << (b - 1).bit_length()     # don't pad past the next pow2
    bt = 8
    while bt * 2 <= min(cap, b_pow2):
        bt *= 2
    return bt


@functools.partial(jax.jit, static_argnames=("n", "inverse", "precision",
                                             "bt", "interp"))
def _fft_pallas(xr, xi, fr, fi, twr, twi, n: int, inverse: bool,
                precision: str, bt: int, interp: bool = False):
    b = xr.shape[0]
    t = n // LANE
    grid = b // bt
    shared = twr is not None
    kern = functools.partial(
        _fft_inv_kernel if inverse else _fft_fwd_kernel,
        t=t, sign=(+1 if inverse else -1), precision=precision,
        shared=shared)
    fdim = fr.shape[1]
    ft = fr.shape[0]                   # T folded, 1 shared
    in_specs = [
        pl.BlockSpec((bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((ft, fdim, LANE), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ft, fdim, LANE), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [xr, xi, fr, fi]
    if shared:
        in_specs += [
            pl.BlockSpec((t, LANE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, LANE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [twr, twi]
    yr, yi = pl.pallas_call(
        kern,
        interpret=interp,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n), jnp.float32),
            jax.ShapeDtypeStruct((b, n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=8 * n * LANE * b, bytes_accessed=16 * b * n,
            transcendentals=0),
    )(*operands)
    return yr, yi


def _run(x: CF, inverse: bool, precision: str) -> CF:
    shape = x.shape
    n = shape[-1]
    b = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    xr = x.re.reshape(b, n)
    xi = x.im.reshape(b, n)
    if n == LANE:
        # single tile: plain (B,128)@(128,128) matmul, no kernel needed
        fr, fi = (_inv_mats if inverse else _fwd_mats)(
            n, +1 if inverse else -1)
        prec = jax.lax.Precision.HIGHEST
        yr = (jnp.dot(xr, jnp.asarray(fr[0]), precision=prec)
              - jnp.dot(xi, jnp.asarray(fi[0]), precision=prec))
        yi = (jnp.dot(xr, jnp.asarray(fi[0]), precision=prec)
              + jnp.dot(xi, jnp.asarray(fr[0]), precision=prec))
        return CF(yr.reshape(shape), yi.reshape(shape))
    bt = _pick_bt(n, b)
    pad = (-b) % bt
    if pad:
        xr = jnp.concatenate([xr, jnp.zeros((pad, n), xr.dtype)])
        xi = jnp.concatenate([xi, jnp.zeros((pad, n), xi.dtype)])
    fr, fi, twr, twi = _mats_packed(n, +1 if inverse else -1, inverse,
                                    precision)
    # interpret mode rides the jit cache key so an env toggle can never
    # silently reuse a trace of the other mode
    interp = interpret_mode()
    yr, yi = _fft_pallas(xr, xi, jnp.asarray(fr), jnp.asarray(fi),
                         None if twr is None else jnp.asarray(twr),
                         None if twi is None else jnp.asarray(twi),
                         n, inverse, precision, bt, interp)
    if pad:
        yr, yi = yr[:b], yi[:b]
    return CF(yr.reshape(shape), yi.reshape(shape))


def fft_ko(x: CF, precision: str = "HIGH") -> CF:
    """Forward DFT over the last axis, output in KERNEL bin order
    (natural[..., k] = out[..., kernel_perm(n)[k]]).  Unnormalized,
    FFTW sign convention — matches core.fft.fft up to the bin permutation."""
    return _run(x, inverse=False, precision=precision)


def ifft_ko(x: CF, precision: str = "HIGH") -> CF:
    """Inverse DFT from KERNEL bin order input to natural time order,
    unnormalized (like FFTW backward / core.fft.ifft)."""
    return _run(x, inverse=True, precision=precision)


def ko_to_natural(x: CF) -> CF:
    """Reorder kernel-bin-order spectra to natural order WITHOUT a lane
    gather (constant-index bulk gathers are a documented pathology on this
    backend): natural.reshape(B, 128, T)[:, u, r] = ko tile bitrev(r) lane
    u, so the reorder is a static tile shuffle (concat of 128-lane slices)
    + one minor-dims transpose — both plain XLA relayouts."""
    shape = x.shape
    n = shape[-1]
    t = n // LANE
    if t <= 1:
        return x
    bits = int(np.log2(t))
    b = int(np.prod(shape[:-1])) if len(shape) > 1 else 1

    def per_plane(a):
        a2 = a.reshape(b, t, LANE)
        # tile r of the (u-major) view is kernel slot bitrev(r)
        shuf = jnp.stack([a2[:, _bitrev(r, bits), :] for r in range(t)],
                         axis=1)                     # (B, T, 128) r-major
        return shuf.transpose(0, 2, 1).reshape(shape)  # (B, 128, T) -> flat

    return CF(per_plane(x.re), per_plane(x.im))


def fft_natural(x: CF, precision: str = "HIGH") -> CF:
    """Forward DFT with natural-order bins: the VMEM kernel + the
    tile-shuffle/transpose reorder.  Drop-in for core.fft.fft on
    supported shapes."""
    return ko_to_natural(fft_ko(x, precision))
