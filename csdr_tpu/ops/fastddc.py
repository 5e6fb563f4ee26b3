"""fastddc — the FFT channelizer / shared-front-end DDC (SURVEY.md §2.5).

Reference: fastddc.c (init math :38-72, inverse :106-166), CLI wiring
csdr.c:2255-2378.  One forward FFT of the wideband stream serves N channels;
each channel multiplies the spectrum by its bandpass taps while FOLDING
fft_size bins into fft_inv_size bins (frequency-domain decimation by
pre_decimation), inverse-FFTs, scraps the overlap (overlap-save), and fixes
the residual shift with a fused decimating NCO.

TPU design:
- fwd: B overlapping frames -> one batched planar Stockham FFT (core/fft.py).
- inv: all C channels at once — the per-channel spectrum rotation
  (offsetbin) is folded into a precomputed gather permutation, the bin fold
  is roll+reshape+sum, the IFFT is batched over (C, B) — everything is a
  dense batched tensor op; channels shard naturally over a mesh axis
  (BASELINE config 5).
- init math mirrors the C bit-for-bit (float32 + C int truncation/rounding)
  so bin quantization matches the reference exactly (SURVEY.md §7 "hard
  parts" #3).
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from csdr_tpu import firdes
from csdr_tpu.core import fft as cfft
from csdr_tpu.core.block import Block, VarOut
from csdr_tpu.core.cplx import CF, expj


@dataclasses.dataclass(frozen=True)
class FastDDC:
    pre_decimation: int
    post_decimation: int
    taps_length: int
    taps_min_length: int
    overlap_length: int
    fft_size: int
    fft_inv_size: int
    input_size: int
    post_input_size: int
    pre_shift: float
    startbin: int
    v: int
    offsetbin: int
    post_shift: float
    scrap: int
    shift_rate: float
    transition_bw: float
    window: str


def fastddc_init(transition_bw: float, decimation: int, shift_rate: float = 0.0,
                 window: str = firdes.WINDOW_DEFAULT) -> FastDDC:
    """Size/shift planning (reference fastddc.c:38-72), exact C semantics:
    float32 arithmetic, int truncation for startbin, C round() for the bin
    quantization."""
    pre, post = 1, decimation
    while post % 2 == 0 and post // 2 != 1:
        post //= 2
        pre *= 2
    taps_min_length = firdes.firdes_filter_len(transition_bw)
    taps_length = cfft.next_pow2(-(-taps_min_length // pre) * pre) + 1
    fft_size = cfft.next_pow2(taps_length * 4)
    while fft_size < pre:
        fft_size *= 2
    overlap_length = taps_length - 1
    input_size = fft_size - overlap_length
    fft_inv_size = fft_size // pre

    v = fft_size // overlap_length
    middlebin = fft_size // 2
    sr = np.float32(shift_rate)
    startbin = int(np.float32(middlebin) + np.float32(middlebin) * (-sr) * np.float32(2))
    startbin = v * int(np.round(np.float32(startbin) / np.float32(v)))
    offsetbin = startbin - middlebin
    post_shift = float(np.float32(pre) * (sr + np.float32(offsetbin) / np.float32(fft_size)))
    pre_shift = float(np.float32(offsetbin) / np.float32(fft_size))
    scrap = overlap_length // pre
    post_input_size = fft_inv_size - scrap
    assert fft_size > 2, "error in fastddc_init()"
    return FastDDC(pre, post, taps_length, taps_min_length, overlap_length,
                   fft_size, fft_inv_size, input_size, post_input_size,
                   pre_shift, startbin, v, offsetbin, post_shift, scrap,
                   float(shift_rate), float(transition_bw), window)


def channel_taps_fft(ddc: FastDDC, shift_rate: float) -> np.ndarray:
    """Side-swapped FFT of the channel bandpass taps (csdr.c:2345-2356):
    complex bandpass around -shift_rate, zero-padded to fft_size, forward
    FFT, fftshift.  Returns complex128 host array (cast at use)."""
    half_bw = 0.5 / (ddc.pre_decimation * ddc.post_decimation)
    taps = firdes.firdes_bandpass_c(ddc.taps_length, (-shift_rate) - half_bw,
                                    (-shift_rate) + half_bw, ddc.window)
    padded = np.zeros(ddc.fft_size, np.complex128)
    padded[: ddc.taps_length] = taps
    tf = np.fft.fft(padded)
    return np.fft.fftshift(tf)


def overlap_frames(x: CF, tail: CF, ins: int, ov: int) -> CF:
    """Overlapping frame matrix (B, ins+ov) from a flat stream + carried
    tail, built with reshape/concat only: frame b = [last ov of block b-1
    (or the tail for b=0) | block b].  A (B, fft) gather from the flat
    stream compiles to a pathologically slow dynamic gather on TPU; this
    form is pure static copies.  Requires ov <= ins (fft = next_pow2(4*taps)
    guarantees ins >= 3*taps > ov)."""
    assert ov <= ins, (ov, ins)
    b = x.shape[0] // ins
    blk_re = x.re.reshape(b, ins)
    blk_im = x.im.reshape(b, ins)
    prev_re = jnp.concatenate([tail.re[None, :], blk_re[:-1, ins - ov:]], 0)
    prev_im = jnp.concatenate([tail.im[None, :], blk_im[:-1, ins - ov:]], 0)
    return CF(jnp.concatenate([prev_re, blk_re], 1),
              jnp.concatenate([prev_im, blk_im], 1))


def _ko_gather_idx(n: int) -> np.ndarray:
    """Index array g with x_ko = x_nat[g] (inverse of fft_pallas.kernel_perm,
    for producing kernel bin order without the pallas kernel)."""
    from csdr_tpu.kernels.fft_pallas import kernel_perm
    perm = kernel_perm(n)
    inv = np.empty(n, np.int32)
    inv[perm] = np.arange(n, dtype=np.int32)
    return inv


def fwd_fft_frames(frames: CF, spectra_order: str) -> CF:
    """Batched forward FFT of overlap frames in the requested bin order.
    'kernel' order runs the VMEM matmul-FFT kernel on TPU (no reordering
    anywhere: consumers fold the digit reversal into their spectral
    matrices); off-TPU it falls back to Stockham + a host-order gather so
    the contract is backend-independent."""
    if spectra_order == "natural":
        return cfft.fft(frames)
    from csdr_tpu.kernels import fft_pallas as fk
    n = frames.shape[-1]
    if fk.use_kernel(n, int(frames.shape[0])):
        return fk.fft_ko(frames)
    g = jnp.asarray(_ko_gather_idx(n))
    s = cfft.fft(frames)
    return CF(s.re[:, g], s.im[:, g])


def fastddc_fwd_block(ddc: FastDDC, frames_per_chunk: int = 32,
                      spectra_order: str = "natural") -> Block:
    """Wideband CF chunk (B*input_size,) -> spectra CF (B, fft_size).

    Streaming overlap matches the reference exactly (csdr.c:2291-2295):
    frame b = [last overlap_length samples | input_size new], no window,
    zero history at stream start.

    spectra_order 'kernel' emits the VMEM matmul-FFT kernel's bin order
    (see kernels/fft_pallas.py) — pair with fastddc_inv_block(...,
    spectra_order='kernel'), which folds the permutation into its matrices.
    """
    ov = ddc.overlap_length
    ins = ddc.input_size

    def init():
        return CF.zeros((ov,))

    def apply(tail, x):
        n = x.shape[0]
        assert n % ins == 0, f"chunk {n} % input_size {ins} != 0"
        b = n // ins
        frames = overlap_frames(x, tail, ins, ov)
        spectra = fwd_fft_frames(frames, spectra_order)
        return x[n - ov:], spectra

    return Block("fastddc_fwd_cc", init, apply, rate_ratio=None)


def fastddc_inv_batch(spectra: CF, ddc: FastDDC, taps_eff: CF,
                      fold_perm: jnp.ndarray):
    """Channelize B spectra for C channels -> time samples (B, C, post_input).

    RETAINED AS THE READABLE SPECIFICATION of the reference inverse (it
    mirrors fastddc.c:106-166 step by step); the production paths are the
    precomposed matmul forms (channel_fused_matrix / channel_class_matrices)
    which are mathematically identical and ~50x faster on the MXU.

    spectra: CF (B, fft_size) RAW (not side-swapped);
    taps_eff: CF (C, fft_size) — side-swapped taps ALREADY permuted into fold
    slot order; fold_perm: (C, fft_size) int32 — raw-spectrum gather indices
    in the same slot order (input side swap + offsetbin rotation baked in).
    Mirrors fastddc.c:106-166: slot (k, j) = k*inv + j accumulates
    S_swapped[i]*T_swapped[i] into folded bin j.
    """
    fft_size = ddc.fft_size
    inv = ddc.fft_inv_size
    pre = ddc.pre_decimation
    s_re = spectra.re[:, fold_perm]               # (B, C, fft)
    s_im = spectra.im[:, fold_perm]
    t_re = taps_eff.re[None, :, :]
    t_im = taps_eff.im[None, :, :]
    z_re = s_re * t_re - s_im * t_im
    z_im = s_re * t_im + s_im * t_re
    zf_re = z_re.reshape(z_re.shape[0], z_re.shape[1], pre, inv).sum(axis=2) / pre
    zf_im = z_im.reshape(z_im.shape[0], z_im.shape[1], pre, inv).sum(axis=2) / pre
    folded = CF(zf_re, zf_im)                     # (B, C, inv)
    folded = cfft.fft_swap_sides(folded)
    td = cfft.ifft(folded, normalize=True)        # (B, C, inv)
    return td[:, :, ddc.scrap:]                   # overlap-scrap


def make_fold_perm(ddc: FastDDC) -> np.ndarray:
    """Swapped-domain permutation: perm[k*inv + j] = the k-th swapped-spectrum
    bin i whose reference fold target (fft_size + i - offsetbin + inv/2) mod
    inv equals j (fastddc.c:126-141).  Gather both the swapped spectrum and
    the swapped taps with this and reshape(pre, inv).sum(0) == the fold."""
    fft_size, inv = ddc.fft_size, ddc.fft_inv_size
    i = np.arange(fft_size)
    out_idx = (fft_size + i - ddc.offsetbin + inv // 2) % inv
    order = np.argsort(out_idx * np.int64(fft_size) + i, kind="stable")
    grouped = order.reshape(inv, ddc.pre_decimation)  # rows j, cols k
    perm = np.empty(fft_size, np.int64)
    for j in range(inv):
        for k in range(ddc.pre_decimation):
            perm[k * inv + j] = grouped[j, k]
    return perm.astype(np.int32)


def raw_gather_perm(ddc: FastDDC) -> np.ndarray:
    """Compose the slot permutation with the input side swap so the RAW
    spectrum can be gathered directly: swapped[i] = raw[(i + fft/2) % fft]."""
    p = make_fold_perm(ddc)
    return ((p + ddc.fft_size // 2) % ddc.fft_size).astype(np.int32)


def channel_matrix(ddc: FastDDC, shift_rate: float) -> np.ndarray:
    """One channel's dense fold matrix block F_c (fft_size, fft_inv_size)
    complex64: folded = raw_spectrum @ F_c reproduces the reference's
    swap-sides -> taps-multiply -> bin-fold (fastddc.c:118-146) as ONE
    linear map.  F_c[i, j] accumulates taps_eff over the pre_decimation
    slots k that fold raw bin i into inverse bin j (already /pre-normalized).

    This is the MXU formulation: per-channel gathers amplify HBM traffic
    fft/inv-fold; a dense matmul against the (fft, C*inv) stack instead puts
    the whole inverse on the systolic array at high arithmetic intensity.
    """
    t, p, _ = channel_arrays(ddc, shift_rate)
    inv = ddc.fft_inv_size
    f = np.zeros((ddc.fft_size, inv), np.complex64)
    slots = np.arange(ddc.fft_size)
    np.add.at(f, (p[slots], slots % inv), t[slots])
    return f / np.float32(ddc.pre_decimation)


def fastddc_inv_batch_mxu(spectra: CF, ddc: FastDDC, fold_mat: CF,
                          precision=jax.lax.Precision.HIGH):
    """Channelize B spectra for C channels via the dense fold matrix:
    spectra CF (B, fft); fold_mat CF (fft, C*inv) from channel_matrix
    blocks.  Returns time samples (B, C, post_input) — same output as
    fastddc_inv_batch, but the fold+taps runs as a complex matmul on the
    MXU (4 real matmuls) instead of a per-channel gather."""
    inv = ddc.fft_inv_size
    b = spectra.shape[0]
    dot = lambda a, m: jnp.dot(a, m, precision=precision,
                               preferred_element_type=jnp.float32)
    zr = dot(spectra.re, fold_mat.re) - dot(spectra.im, fold_mat.im)
    zi = dot(spectra.re, fold_mat.im) + dot(spectra.im, fold_mat.re)
    folded = CF(zr.reshape(b, -1, inv), zi.reshape(b, -1, inv))
    folded = cfft.fft_swap_sides(folded)
    td = cfft.ifft(folded, normalize=True)
    return td[:, :, ddc.scrap:]


def channel_fused_matrix(ddc: FastDDC, shift_rate: float):
    """The WHOLE per-channel inverse as one (fft_size, M) complex matrix G,
    M = post_input_size / post_decimation (requires pis % post == 0).

    Everything after the forward FFT is linear in the spectrum: taps
    multiply + bin fold (channel_matrix F), side swap + inverse FFT +
    overlap-scrap + post-decimation subsampling (a DFT-column selection W),
    and the within-frame part of the residual-shift NCO (a diagonal B).
    The frame-dependent NCO part separates into a per-frame scalar A(b):

        out[b, m] = A(b) * (spectra[b] @ G)[m],   G = F @ (W .* B)

    so the 64-channel inverse is ONE MXU matmul per chunk — smaller than F
    itself (M < inv).  Returns (G complex64, frame_cycles float64) where
    frame_cycles = frac(M * dsa_rate) advances the per-frame NCO phase.
    """
    pis, post = ddc.post_input_size, ddc.post_decimation
    inv, scrap = ddc.fft_inv_size, ddc.scrap
    assert pis % post == 0, (pis, post)
    m = pis // post
    f = channel_matrix(ddc, shift_rate)                      # (fft, inv)
    ch = fastddc_init(ddc.transition_bw,
                      ddc.pre_decimation * ddc.post_decimation,
                      float(shift_rate), ddc.window)
    dsa = np.float64(np.float32(ch.post_shift)) * post       # cycles/taken
    k = np.arange(inv)[:, None]
    t = scrap + post * np.arange(m)[None, :]
    w = np.exp(2j * np.pi * (k + inv // 2) * t / inv) / inv  # swap+ifft+sel
    b = np.exp(2j * np.pi * np.mod(np.arange(m) * dsa, 1.0))  # in-frame NCO
    g = (f @ (w * b[None, :])).astype(np.complex64)
    return g, np.mod(m * dsa, 1.0)


def channel_arrays(ddc: FastDDC, shift_rate: float):
    """Host-side per-channel arrays for the dynamic inverse: (taps_eff_row
    complex64 (fft,), fold_perm_row int32 (fft,), dsa_rate float32).  A ddcd
    retune recomputes ONE channel's rows — microseconds of numpy — and ships
    them to the device; the jitted step never recompiles (they are traced
    arguments, not closure constants)."""
    ch = fastddc_init(ddc.transition_bw,
                      ddc.pre_decimation * ddc.post_decimation,
                      float(shift_rate), ddc.window)
    assert ch.fft_size == ddc.fft_size and ch.fft_inv_size == ddc.fft_inv_size
    taps_row = channel_taps_fft(ch, float(shift_rate)).astype(np.complex64)
    taps_row = taps_row[make_fold_perm(ch)]
    return taps_row, raw_gather_perm(ch), np.float32(ch.post_shift) * ddc.post_decimation


def dynamic_channel_cols(ddc: FastDDC, shift_rate: float,
                         spectra_order: str = "natural"):
    """One channel's dynamic-inverse payload: (G_block, cyc) matching the
    layout fastddc_inv_dynamic_block expects — fused (fft, M) + per-frame
    cycles for divisible post decimation, else phase-classed
    (q, fft, m_max) + per-taken-sample cycles.

    spectra_order 'kernel': spectrum rows permuted for matmul-FFT kernel
    bin order (pair with fastddc_fwd_block(..., spectra_order='kernel'))."""
    if ddc.post_input_size % ddc.post_decimation == 0:
        g, fc = channel_fused_matrix(ddc, shift_rate)
        ax = 0
        cyc = np.float32(fc)
    else:
        g, dsa = channel_class_matrices(ddc, shift_rate)
        ax = 1
        cyc = np.float32(np.mod(dsa, 1.0))
    if spectra_order == "kernel":
        from csdr_tpu.kernels.fft_pallas import kernel_perm
        gk = np.empty_like(g)
        idx = [slice(None)] * g.ndim
        idx[ax] = kernel_perm(ddc.fft_size)
        gk[tuple(idx)] = g
        g = gk
    return g, cyc


def fastddc_inv_dynamic_block(ddc: FastDDC, n_channels: int):
    """The ddcd-server inverse: the fused/classed G matrices and NCO rates
    are ARGUMENTS of the jitted step so channels can be retuned, claimed,
    or released at runtime with no recompilation (the TPU-native
    replacement for ddcd forking a fresh ``csdr fastddc_inv_cc`` per
    client, ddcd_old.cpp:238-256).  A retune rewrites one channel's G
    column block (dynamic_channel_cols).

    Returns (init, step, g_shape):
      divisible post:  g (fft, C*M) CF, cyc (C,) = per-FRAME NCO cycles
      otherwise:       g (q, fft, C*m_max) CF, cyc (C,) = per-taken cycles
    step(state, spectra CF (B, fft), g, cyc) -> (state', VarOut).
    NCO ramps use on-device f32 (cyc is traced); the carried phase keeps
    drift bounded per chunk — same order as the reference's own f32 phase
    accumulation."""
    pis, post = ddc.post_input_size, ddc.post_decimation
    c = n_channels

    if pis % post == 0:
        m = pis // post

        def init():
            return jnp.zeros((c,), jnp.float32)

        def step(phases, spectra: CF, g: CF, cyc):
            b = spectra.shape[0]
            dot = lambda a, mm: jnp.dot(
                a, mm, precision=jax.lax.Precision.HIGH,
                preferred_element_type=jnp.float32)
            zr = dot(spectra.re, g.re) - dot(spectra.im, g.im)
            zi = dot(spectra.re, g.im) + dot(spectra.im, g.re)
            zr = zr.reshape(b, c, m).transpose(1, 0, 2)
            zi = zi.reshape(b, c, m).transpose(1, 0, 2)
            k = jnp.arange(b, dtype=jnp.float32)
            ramp = (k[None, :] * cyc[:, None]) % 1.0
            rot = expj(2.0 * np.pi * ((phases[:, None] + ramp) % 1.0))
            yr = zr * rot.re[:, :, None] - zi * rot.im[:, :, None]
            yi = zr * rot.im[:, :, None] + zi * rot.re[:, :, None]
            out = CF(yr.reshape(c, b * m), yi.reshape(c, b * m))
            counts = jnp.full((c,), b * m, jnp.int32)
            nphase = (phases + (b * cyc) % 1.0) % 1.0
            return nphase, VarOut(out, counts)

        return init, step, (ddc.fft_size, c * m)

    q, t0s, ms, m_max, s_np = _class_plan(ddc)
    ga = q * pis // post
    g0_local = np.asarray([(bb * pis + t0s[bb]) // post for bb in range(q)],
                          np.float32)

    def init():
        return jnp.zeros((c,), jnp.float32)

    def step(phases, spectra: CF, g: CF, cyc):
        b = spectra.shape[0]
        assert b % q == 0, f"chunk frames {b} % q {q} != 0"
        groups = b // q
        sr = spectra.re.reshape(groups, q, -1).transpose(1, 0, 2)
        si = spectra.im.reshape(groups, q, -1).transpose(1, 0, 2)
        dot = lambda a, mm: jnp.einsum(
            "qgf,qfm->qgm", a, mm, precision=jax.lax.Precision.HIGH,
            preferred_element_type=jnp.float32)
        zr = dot(sr, g.re) - dot(si, g.im)
        zi = dot(sr, g.im) + dot(si, g.re)
        zr = zr.reshape(q, groups, c, m_max).transpose(2, 1, 0, 3)
        zi = zi.reshape(q, groups, c, m_max).transpose(2, 1, 0, 3)
        jj = jnp.arange(groups, dtype=jnp.float32)
        base = (jj[None, :, None] * ((ga * cyc) % 1.0)[:, None, None]
                + g0_local[None, None, :] * cyc[:, None, None]) % 1.0
        rot = expj(2.0 * np.pi * ((phases[:, None, None] + base) % 1.0))
        yr = zr * rot.re[..., None] - zi * rot.im[..., None]
        yi = zr * rot.im[..., None] + zi * rot.re[..., None]
        s_j = jnp.asarray(s_np)
        yr = jnp.einsum("gkm,mn->gkn", yr.reshape(c, groups, q * m_max), s_j,
                        precision=jax.lax.Precision.HIGHEST)
        yi = jnp.einsum("gkm,mn->gkn", yi.reshape(c, groups, q * m_max), s_j,
                        precision=jax.lax.Precision.HIGHEST)
        out = CF(yr.reshape(c, groups * ga), yi.reshape(c, groups * ga))
        counts = jnp.full((c,), groups * ga, jnp.int32)
        nphase = (phases + (groups * ((ga * cyc) % 1.0)) % 1.0) % 1.0
        return nphase, VarOut(out, counts)

    return init, step, (q, ddc.fft_size, c * m_max)


def mpad_for(ddc: FastDDC) -> int:
    """Lane-padded per-frame output width of the factored/vmem inverse:
    the kernel's d/W blocks carry m = post_input_size/post_decimation
    values padded to a 128 multiple (m exceeds 128 at small decimations,
    e.g. D=4 -> m=224)."""
    m = ddc.post_input_size // ddc.post_decimation
    return max(128, -(-m // 128) * 128)


def dynamic_channel_rows(ddc: FastDDC, shift_rate: float,
                         mpad: int | None = None):
    """One channel's FACTORED dynamic-inverse payload (divisible post only):
    (tq_row (pre, inv) c64, d_row (mpad,) c64, cyc f32).  A ddcd retune
    recomputes fft + M complex values instead of the dense fused column
    block's fft*M — ~50x smaller payload at D=16."""
    tq, _w, d, cyc = channel_factored2_arrays(ddc, [float(shift_rate)])
    m = ddc.post_input_size // ddc.post_decimation
    if mpad is None:
        mpad = mpad_for(ddc)
    drow = np.zeros((mpad,), np.complex64)
    drow[:m] = d[0]
    return tq[0], drow, np.float32(cyc[0])


def fastddc_inv_dynamic_factored_block(ddc: FastDDC, n_channels: int,
                                       precision: str = "HIGH"):
    """Factored-v2 dynamic inverse (pis % post == 0): per-channel TQ/d rows
    are ARGUMENTS of the jitted step (retunes never recompile — same
    contract as fastddc_inv_dynamic_block) but the step runs the shared-W
    factored form — on TPU the VMEM pallas kernel, elsewhere (or on ragged
    chunks) the XLA factored2 path.  ~8x fewer MACs than the dense dynamic
    matmul at D=16.

    Returns (init, step): step(state, spectra CF (B, fft), tq CF
    (C, pre, inv), d CF (C, mpad), cyc (C,)) -> (state', VarOut); the state
    carries (phases, packed W) — the shared iDFT matrix rides the pytree so
    it is a program ARGUMENT, not a multi-MB compile-time constant baked
    into the shipped executable."""
    from csdr_tpu.kernels import fastddc_pallas as fpk

    pis, post = ddc.post_input_size, ddc.post_decimation
    assert pis % post == 0, (pis, post)
    c = n_channels
    m = pis // post
    mpad = mpad_for(ddc)
    _tq0, w_np, _d0, _cyc0 = channel_factored2_arrays(ddc, [0.0])
    w1_np = fpk.pack_w(w_np, precision, mpad)

    def init():
        return (jnp.zeros((c,), jnp.float32), jnp.asarray(w1_np))

    def step(state, spectra: CF, tq: CF, d: CF, cyc):
        phases, w1 = state
        b = spectra.shape[0]
        k = jnp.arange(b, dtype=jnp.float32)
        ramp = (k[None, :] * cyc[:, None]) % 1.0
        rot = expj(2.0 * np.pi * ((phases[:, None] + ramp) % 1.0))
        y = _inv_factored2_dispatch(spectra, tq, d, w1, w_np, rot, m,
                                    precision)
        out = CF(y.re.reshape(c, b * m), y.im.reshape(c, b * m))
        counts = jnp.full((c,), b * m, jnp.int32)
        nphase = (phases + (b * cyc) % 1.0) % 1.0
        return (nphase, w1), VarOut(out, counts)

    return init, step


def dynamic_channelizer_rows(ddc: FastDDC, shift_rate: float,
                             mpad: int | None = None):
    """One channel's payload for the dynamic FUSED channelizer:
    (tq2_row (pre, inv) c64 — split-DFT twiddles absorbed, d_row (mpad,)
    c64, cyc f32).  Same size as dynamic_channel_rows.

    The TQ->TQ2 fold is channelizer_arrays' (single channel): reusing it
    keeps retune payloads numerically IDENTICAL to the block's initially
    built rows (both must match for a re-tune back to a starting rate to
    restore bit-identical output)."""
    tq2, _wdft, _w, d, cyc = channelizer_arrays(ddc, [float(shift_rate)])
    m = ddc.post_input_size // ddc.post_decimation
    if mpad is None:
        mpad = mpad_for(ddc)
    drow = np.zeros((mpad,), np.complex64)
    drow[:m] = d[0]
    return tq2[0], drow, np.float32(cyc[0])


def fastddc_dynamic_channelizer_block(ddc: FastDDC, n_channels: int,
                                      precision: str = "HIGH"):
    """Dynamic (retunable) FUSED channelizer: wideband chunk in, per-channel
    baseband out, with the subsequence-split DFT matmul replacing the fwd
    FFT and per-channel TQ2/d rows as traced arguments (retunes never
    recompile).  Divisible-post configs only.

    Returns (init, step): step(state, x CF, tq2 CF (C, pre, inv),
    d CF (C, mpad), cyc (C,)) -> (state', VarOut); the state carries
    (tail, phases, wdft, packed W) — the DFT and iDFT matrices ride the
    pytree so they are program ARGUMENTS, not multi-MB compile-time
    constants baked into the shipped executable."""
    from csdr_tpu.kernels import fastddc_pallas as fpk

    pis, post = ddc.post_input_size, ddc.post_decimation
    assert pis % post == 0, (pis, post)
    c = n_channels
    m = pis // post
    ov, ins = ddc.overlap_length, ddc.input_size
    pre, inv, fft = ddc.pre_decimation, ddc.fft_inv_size, ddc.fft_size
    mpad = mpad_for(ddc)
    _tq0, wdft_np, w_np, _d0, _cyc0 = channelizer_arrays(ddc, [0.0])
    w1_np = fpk.pack_w(w_np, precision, mpad)
    dft_prec = getattr(jax.lax.Precision, precision)
    wdft_r = wdft_np.real.astype(np.float32)
    wdft_i = wdft_np.imag.astype(np.float32)

    def init():
        return (CF.zeros((ov,)), jnp.zeros((c,), jnp.float32),
                CF(jnp.asarray(wdft_r), jnp.asarray(wdft_i)),
                jnp.asarray(w1_np))

    def step(state, x: CF, tq2: CF, d: CF, cyc):
        tail, phases, wdft, w1 = state
        n = x.shape[0]
        assert n % ins == 0, f"chunk {n} % input_size {ins} != 0"
        b = n // ins
        frames = overlap_frames(x, tail, ins, ov)
        x6r = frames.re.reshape(b, inv, pre).swapaxes(1, 2)
        x6i = frames.im.reshape(b, inv, pre).swapaxes(1, 2)
        ein = lambda u, v: jnp.einsum(
            "bpn,nm->bpm", u, v, precision=dft_prec,
            preferred_element_type=jnp.float32)
        y2r = ein(x6r, wdft.re) - ein(x6i, wdft.im)
        y2i = ein(x6r, wdft.im) + ein(x6i, wdft.re)
        s = CF(y2r.reshape(b, fft), y2i.reshape(b, fft))
        k = jnp.arange(b, dtype=jnp.float32)
        ramp = (k[None, :] * cyc[:, None]) % 1.0
        rot = expj(2.0 * np.pi * ((phases[:, None] + ramp) % 1.0))
        y = _inv_factored2_dispatch(s, tq2, d, w1, w_np, rot, m,
                                    precision)
        out = CF(y.re.reshape(c, b * m), y.im.reshape(c, b * m))
        counts = jnp.full((c,), b * m, jnp.int32)
        nphase = (phases + (b * cyc) % 1.0) % 1.0
        return ((x[n - ov:], nphase, wdft, w1), VarOut(out, counts))

    return init, step


def fastddc_inv_block(ddc: FastDDC, shift_rates, frames_per_chunk: int = 32,
                      spectra_order: str = "natural") -> Block:
    """Spectra CF (B, fft_size) -> per-channel baseband VarOut.

    shift_rates: list of channel shifts.  NOTE all channels share the sizing
    of ``ddc`` but each has its own offsetbin/post_shift (computed via
    fastddc_init per rate) — exactly N reference fastddc_inv_cc processes.
    Output: VarOut(data (C, cap), counts (C,)) where cap is the per-chunk
    capacity of the decimated stream.

    spectra_order 'kernel': input spectra are in the matmul-FFT kernel's
    bin order (fastddc_fwd_block(..., spectra_order='kernel')); the digit
    reversal is folded into the spectral matrices host-side — zero runtime
    reordering on either side.
    """
    rates = list(map(float, shift_rates))
    chans = [fastddc_init(ddc.transition_bw, ddc.pre_decimation * ddc.post_decimation,
                          r, ddc.window) for r in rates]
    for ch in chans:
        assert ch.fft_size == ddc.fft_size and ch.fft_inv_size == ddc.fft_inv_size
    if ddc.post_input_size % ddc.post_decimation == 0:
        assert spectra_order == "natural", \
            "divisible-post configs run the fused channelizer instead"
        from csdr_tpu.kernels.fastddc_pallas import kernel_enabled
        if jax.default_backend() == "tpu" and kernel_enabled():
            return _fastddc_inv_vmem_block(ddc, rates)
        return _fastddc_inv_fused_block(ddc, rates)
    return _fastddc_inv_classed_block(ddc, rates, spectra_order)


def channel_factored_arrays(ddc: FastDDC, rates):
    """Host arrays for the FACTORED inverse (see _fastddc_inv_factored_block):
    TQ (C, pre, inv) complex64 — the raw-order taps spectrum / pre, reshaped
    so TQ[c, j, m] multiplies raw bin j*inv + m; E (C, inv, M) complex64 —
    the shared swap+iFFT+post-select+in-frame-NCO matrix, row-rolled by each
    channel's fold shift cc = (-offsetbin + inv/2) mod inv; frame_cyc (C,).

    Validation (exact vs channel_fused_matrix):
      G_c[r, out] == TQ_c[r // inv... flat r] * E_c[r % inv, out]."""
    inv, fft, pre = ddc.fft_inv_size, ddc.fft_size, ddc.pre_decimation
    pis, post = ddc.post_input_size, ddc.post_decimation
    assert pis % post == 0
    m = pis // post
    tq_list, e_list, cyc_list = [], [], []
    half_bw = 0.5 / (ddc.pre_decimation * ddc.post_decimation)
    k = np.arange(inv)[:, None]
    t_sel = ddc.scrap + post * np.arange(m)[None, :]
    w = np.exp(2j * np.pi * (k + inv // 2) * t_sel / inv) / inv
    for rate in map(float, rates):
        ch = fastddc_init(ddc.transition_bw,
                          ddc.pre_decimation * ddc.post_decimation, rate,
                          ddc.window)
        taps = firdes.firdes_bandpass_c(ch.taps_length, -rate - half_bw,
                                        -rate + half_bw, ddc.window)
        padded = np.zeros(fft, np.complex128)
        padded[: ch.taps_length] = taps
        tq = (np.fft.fft(padded) / pre).astype(np.complex64)
        cc = (-ch.offsetbin + inv // 2) % inv
        dsa = np.float64(np.float32(ch.post_shift)) * post
        b_nco = np.exp(2j * np.pi * np.mod(np.arange(m) * dsa, 1.0))
        wb = w * b_nco[None, :]
        e = wb[(np.arange(inv) + cc) % inv, :].astype(np.complex64)
        tq_list.append(tq.reshape(pre, inv))
        e_list.append(e)
        cyc_list.append(np.mod(m * dsa, 1.0))
    return (np.stack(tq_list), np.stack(e_list),
            np.asarray(cyc_list, np.float64))


def fastddc_inv_factored_batch(spectra: CF, tq: CF, e: CF,
                               precision=jax.lax.Precision.HIGH):
    """Factored inverse: out[b, c, :] (before the per-frame NCO).

    The fused G_c (fft x M dense) executes fft MACs per output; but the
    fold is an affine mod-inv shift per channel, so G_c factorizes EXACTLY
    into  Z[b,c,m] = sum_j R2[b,j,m] * TQ[c,j,m]  (the class-sum, pre MACs
    per bin)  followed by  Z[b,c,:] @ E_c  (inv MACs per output) — about
    fft/(inv + fft/M) ~ 7x fewer MACs at D=16.

    MEASURED (v5e, B=1024, C=64): 0.31 ms vs the fused matmul's 0.26 ms —
    the Z intermediate (B*C*inv complex = 67 MB) round-trips HBM, and the
    j-contraction (K=8) cannot use the MXU, so the MAC saving does not
    convert to time on this chip; the dense fused matmul (89% of the HIGH
    MXU rate) remains the production path.  Kept as the readable, exact
    specification of the inverse's algebraic structure and for backends
    where flops, not bandwidth, bind (tested equal in
    tests/test_fastddc.py).

    spectra CF (B, fft); tq CF (C, pre, inv); e CF (C, inv, M)."""
    b = spectra.shape[0]
    c, pre, inv = tq.shape
    r2_re = spectra.re.reshape(b, pre, inv)
    r2_im = spectra.im.reshape(b, pre, inv)
    es = lambda u, v: jnp.einsum("bjm,cjm->bcm", u, v,
                                 precision=precision,
                                 preferred_element_type=jnp.float32)
    z_re = es(r2_re, tq.re) - es(r2_im, tq.im)          # (B, C, inv)
    z_im = es(r2_re, tq.im) + es(r2_im, tq.re)
    em = lambda u, v: jnp.einsum("bcm,cmo->cbo", u, v,
                                 precision=precision,
                                 preferred_element_type=jnp.float32)
    y_re = em(z_re, e.re) - em(z_im, e.im)              # (C, B, M)
    y_im = em(z_re, e.im) + em(z_im, e.re)
    return CF(y_re, y_im)


def channel_factored2_arrays(ddc: FastDDC, rates):
    """Host arrays for the SHARED-iDFT factored inverse (factored-v2).

    The r2 factored form (channel_factored_arrays) still needed a per-channel
    iDFT matrix E_c = (W ⊙ b_c) row-rolled by the channel's fold shift cc_c,
    which forces C small batched matmuls.  But the roll is removable: the
    selected output times t_o = scrap + post*o are INTEGERS, so rolling the
    row index of W[k, o] = exp(2πi (k+inv/2) t_o / inv)/inv is exactly a
    column scaling:

        W[(k+cc) mod inv, o] = W[k, o] * exp(2πi cc t_o / inv)

    (the mod wrap drops because exp(2πi t_o) = 1).  Hence

        out[b, c, o] = (Z[b, c, :] @ W)[o] * d_c[o],
        Z[b, c, m]   = sum_j spectra[b, j*inv + m] * TQ[c, j, m],
        d_c[o]       = exp(2πi cc_c t_o / inv) * b_nco_c[o]

    — ONE shared (B*C, inv) @ (inv, M) MXU matmul for ALL channels plus an
    elementwise diagonal, ~fft*M/(fft + inv*M) x fewer MACs than the fused
    dense G (8x at D=16) with perfect matmul shape.  Mirrors the same
    linear map as fastddc.c:106-166 per channel.

    Returns (TQ (C, pre, inv) c64, W (inv, M) c64, D (C, M) c64,
    frame_cyc (C,) f64)."""
    inv, fft, pre = ddc.fft_inv_size, ddc.fft_size, ddc.pre_decimation
    pis, post = ddc.post_input_size, ddc.post_decimation
    assert pis % post == 0
    m = pis // post
    half_bw = 0.5 / (ddc.pre_decimation * ddc.post_decimation)
    k = np.arange(inv)[:, None]
    t_sel = ddc.scrap + post * np.arange(m)[None, :]
    w = (np.exp(2j * np.pi * (k + inv // 2) * t_sel / inv) / inv)
    tq_list, d_list, cyc_list = [], [], []
    for rate in map(float, rates):
        ch = fastddc_init(ddc.transition_bw,
                          ddc.pre_decimation * ddc.post_decimation, rate,
                          ddc.window)
        taps = firdes.firdes_bandpass_c(ch.taps_length, -rate - half_bw,
                                        -rate + half_bw, ddc.window)
        padded = np.zeros(fft, np.complex128)
        padded[: ch.taps_length] = taps
        tq = (np.fft.fft(padded) / pre).astype(np.complex64)
        cc = (-ch.offsetbin + inv // 2) % inv
        dsa = np.float64(np.float32(ch.post_shift)) * post
        b_nco = np.exp(2j * np.pi * np.mod(np.arange(m) * dsa, 1.0))
        roll_fac = np.exp(2j * np.pi * cc * t_sel[0] / inv)
        tq_list.append(tq.reshape(pre, inv))
        d_list.append((roll_fac * b_nco).astype(np.complex64))
        cyc_list.append(np.mod(m * dsa, 1.0))
    return (np.stack(tq_list), w.astype(np.complex64), np.stack(d_list),
            np.asarray(cyc_list, np.float64))


def _inv_factored2_dispatch(spectra, tq, d, w1, w_np, rot, m: int,
                            precision: str):
    """Kernel-vs-XLA dispatch shared by every factored-v2 inverse block:
    the VMEM pallas kernel when the backend and (chunk, plan) shape allow
    (kernels/fastddc_pallas.pick_tiles), else the XLA factored batch at
    the SAME precision with the per-frame NCO applied after.

    spectra CF (B, fft); tq CF (C, pre, inv); d CF (C, mpad) padded
    diagonal; w1 packed kernel matrix (device array or ndarray);
    w_np complex ndarray (inv, M); rot CF (C, B).  Returns CF (C, B, m)."""
    from csdr_tpu.kernels import fastddc_pallas as fpk

    b = spectra.shape[0]
    c = tq.re.shape[0]
    from csdr_tpu.kernels.fft_pallas import interpret_mode
    if ((jax.default_backend() == "tpu" or interpret_mode())
            and fpk.pick_tiles(b, c, tq.re.shape[1], tq.re.shape[2])
                is not None):
        return fpk.fastddc_inv_vmem(spectra, tq, jnp.asarray(w1), d, rot, m,
                                    precision)
    wq = CF(jnp.asarray(w_np.real.astype(np.float32)),
            jnp.asarray(w_np.imag.astype(np.float32)))
    dq = CF(d.re[:, :m], d.im[:, :m])
    prec = (getattr(jax.lax.Precision, precision)
            if isinstance(precision, str) else precision)
    y0 = fastddc_inv_factored2_batch(spectra, tq, wq, dq, precision=prec)
    return CF(y0.re * rot.re[:, :, None] - y0.im * rot.im[:, :, None],
              y0.re * rot.im[:, :, None] + y0.im * rot.re[:, :, None])


def fastddc_inv_factored2_batch(spectra: CF, tq: CF, w: CF, d: CF,
                                precision=jax.lax.Precision.HIGH):
    """Factored-v2 inverse (XLA form): VPU fold + ONE shared iDFT matmul +
    per-channel output diagonal (see channel_factored2_arrays; before the
    per-frame NCO).  spectra CF (B, fft); tq CF (C, pre, inv);
    w CF (inv, M); d CF (C, M).  Returns CF (C, B, M)."""
    b = spectra.shape[0]
    c, pre, inv = tq.shape
    r2_re = spectra.re.reshape(b, pre, inv)
    r2_im = spectra.im.reshape(b, pre, inv)
    es = lambda u, v: jnp.einsum("bjm,cjm->cbm", u, v,
                                 precision=jax.lax.Precision.HIGHEST,
                                 preferred_element_type=jnp.float32)
    z_re = es(r2_re, tq.re) - es(r2_im, tq.im)          # (C, B, inv)
    z_im = es(r2_re, tq.im) + es(r2_im, tq.re)
    z_re = z_re.reshape(c * b, inv)
    z_im = z_im.reshape(c * b, inv)
    dot = lambda u, v: jnp.dot(u, v, precision=precision,
                               preferred_element_type=jnp.float32)
    y_re = (dot(z_re, w.re) - dot(z_im, w.im)).reshape(c, b, -1)
    y_im = (dot(z_re, w.im) + dot(z_im, w.re)).reshape(c, b, -1)
    out_re = y_re * d.re[:, None, :] - y_im * d.im[:, None, :]
    out_im = y_re * d.im[:, None, :] + y_im * d.re[:, None, :]
    return CF(out_re, out_im)


def _fastddc_inv_fused_block(ddc: FastDDC, rates) -> Block:
    """Fused single-matmul inverse (see channel_fused_matrix); used by
    fastddc_inv_block whenever post_input_size % post_decimation == 0.
    State: per-channel NCO phase in cycles."""
    c = len(rates)
    cols = [channel_fused_matrix(ddc, r) for r in rates]
    g_np = np.concatenate([g for g, _ in cols], axis=1)     # (fft, C*M)
    frame_cyc = np.asarray([fc for _, fc in cols], np.float64)  # (C,)
    m = ddc.post_input_size // ddc.post_decimation

    ramp_cache: dict[int, tuple] = {}

    def _ramps(b: int):
        # NOTE: cache NUMPY arrays (safe to embed as constants in any trace);
        # caching jnp arrays created inside a trace leaks tracers
        if b not in ramp_cache:
            # exact f64 per-frame NCO cycles, and the per-chunk advance
            r = np.mod(np.arange(b)[None, :] * frame_cyc[:, None], 1.0)
            ramp_cache[b] = (r.astype(np.float32),
                             np.mod(b * frame_cyc, 1.0).astype(np.float32))
        return ramp_cache[b]

    def init():
        # the G matrix rides in the state pytree (argument), NOT the
        # closure: closed-over arrays lower as compile-time constants and
        # large channel counts would blow up the shipped program
        return (jnp.zeros((c,), jnp.float32),   # phase per channel, cycles
                CF(jnp.asarray(g_np.real), jnp.asarray(g_np.imag)))

    def apply(state, spectra: CF):
        phases, g = state
        b = spectra.shape[0]
        ramp, adv = _ramps(b)
        dot = lambda a, mm: jnp.dot(a, mm, precision=jax.lax.Precision.HIGH,
                                    preferred_element_type=jnp.float32)
        zr = dot(spectra.re, g.re) - dot(spectra.im, g.im)   # (b, C*M)
        zi = dot(spectra.re, g.im) + dot(spectra.im, g.re)
        zr = zr.reshape(b, c, m).transpose(1, 0, 2)          # (C, b, M)
        zi = zi.reshape(b, c, m).transpose(1, 0, 2)
        ph = 2.0 * np.pi * ((phases[:, None] + ramp) % 1.0)
        rot = expj(ph)                                       # (C, b)
        yr = zr * rot.re[:, :, None] - zi * rot.im[:, :, None]
        yi = zr * rot.im[:, :, None] + zi * rot.re[:, :, None]
        out = CF(yr.reshape(c, b * m), yi.reshape(c, b * m))
        counts = jnp.full((c,), b * m, jnp.int32)
        return ((phases + adv) % 1.0, g), VarOut(out, counts)

    return Block("fastddc_inv_cc", init, apply)


def _fastddc_inv_vmem_block(ddc: FastDDC, rates,
                            precision: str = "HIGH") -> Block:
    """TPU production inverse: the factored-v2 pallas kernel
    (kernels/fastddc_pallas.py) — VPU fold + per-frame NCO + ONE shared
    iDFT matmul + output diagonal, all in VMEM.  ~8x fewer MACs than the
    fused dense G at D=16; same linear map (tests/test_fastddc.py).
    Chunk shapes the kernel can't tile fall back to the XLA factored-v2
    path (fastddc_inv_factored2_batch) with identical state.

    precision: "HIGH" = manual bf16x3 shared dot (~109 dB vs the fused
    HIGHEST matmul), "HIGHEST" = f32 Mosaic dot."""
    from csdr_tpu.kernels import fastddc_pallas as fpk

    c = len(rates)
    m = ddc.post_input_size // ddc.post_decimation
    tq_np, w_np, d_np, frame_cyc = channel_factored2_arrays(ddc, rates)
    mpad = mpad_for(ddc)
    w1_np = fpk.pack_w(w_np, precision, mpad)
    dpad = np.zeros((c, mpad), np.complex64)
    dpad[:, :m] = d_np

    ramp_cache: dict[int, tuple] = {}

    def _ramps(b: int):
        # cache NUMPY (jnp created inside a trace leaks tracers)
        if b not in ramp_cache:
            r = np.mod(np.arange(b)[None, :] * frame_cyc[:, None], 1.0)
            ramp_cache[b] = (r.astype(np.float32),
                             np.mod(b * frame_cyc, 1.0).astype(np.float32))
        return ramp_cache[b]

    def init():
        # arrays ride the state pytree (arguments), not the closure
        return (jnp.zeros((c,), jnp.float32),
                CF(jnp.asarray(tq_np.real), jnp.asarray(tq_np.imag)),
                CF(jnp.asarray(dpad.real), jnp.asarray(dpad.imag)),
                jnp.asarray(w1_np))

    def apply(state, spectra: CF):
        phases, tq, d, w1 = state
        b = spectra.shape[0]
        ramp, adv = _ramps(b)
        rot = expj(2.0 * np.pi * ((phases[:, None] + ramp) % 1.0))  # (C, b)
        y = _inv_factored2_dispatch(spectra, tq, d, w1, w_np, rot, m,
                                    precision)
        out = CF(y.re.reshape(c, b * m), y.im.reshape(c, b * m))
        counts = jnp.full((c,), b * m, jnp.int32)
        return ((phases + adv) % 1.0, tq, d, w1), VarOut(out, counts)

    return Block("fastddc_inv_cc", init, apply)


def channelizer_arrays(ddc: FastDDC, rates):
    """Host arrays for the FULLY-FUSED channelizer (fwd DFT + factored-v2
    inverse with no standalone FFT).

    The forward fft-point DFT splits over the pre stride-decimated
    subsequences:  X[j*inv + m] = sum_{n2<pre} e_fft^{-n2(m+inv*j)} *
    DFT_inv(frame[n2::pre])[m],  so the fold absorbs the twiddles:

        Z[b,c,m] = sum_j TQ[c,j,m] X[j*inv+m]
                 = sum_{n2} TQ2[c,n2,m] * Y[b,n2,m],
        Y[b,n2,:] = frame[b, n2::pre] @ Wdft      (ONE (B*pre, inv) MXU dot)
        TQ2[c,n2,m] = sum_j TQ[c,j,m] e_fft^{-n2(m+inv*j)}

    — the channelizer becomes two MXU matmuls + a VPU fold; the radix-2
    FFT leaves the critical path entirely.  Returns (TQ2 (C, pre, inv),
    Wdft (inv, inv), W (inv, M), D (C, M), frame_cyc (C,)), all c64/f64,
    feeding the same vmem kernel as channel_factored2_arrays (the split
    array is byte-compatible with the (B, fft) spectra layout)."""
    inv, fft, pre = ddc.fft_inv_size, ddc.fft_size, ddc.pre_decimation
    tq, w, d, cyc = channel_factored2_arrays(ddc, rates)
    n2 = np.arange(pre)
    j = np.arange(pre)
    m = np.arange(inv)
    # (n2, j, m) twiddle, f64 host math
    tw = np.exp(-2j * np.pi * n2[:, None, None]
                * (m[None, None, :] + inv * j[None, :, None]) / fft)
    tq2 = np.einsum("cjm,njm->cnm", tq.astype(np.complex128), tw)
    n1 = np.arange(inv)
    wdft = np.exp(-2j * np.pi * np.outer(n1, m) / inv)
    return (tq2.astype(np.complex64), wdft.astype(np.complex64), w, d, cyc)


def fastddc_channelizer_block(ddc: FastDDC, shift_rates,
                              precision: str = "HIGH") -> Block:
    """Wideband CF chunk -> per-channel baseband VarOut, fwd + inverse in
    one block with NO standalone FFT (see channelizer_arrays): overlap
    framing, the subsequence-split DFT as one MXU einsum, then the
    factored-v2 vmem kernel (or its XLA fallback).  Same linear map as
    fastddc_fwd_block + fastddc_inv_block (tests/test_fastddc.py); requires
    post_input_size % post_decimation == 0.

    precision: "HIGH" = 3-pass bf16 DFT einsum + manual-bf16x3 kernel dot;
    "HIGHEST" = f32 throughout (golden-grade)."""
    from csdr_tpu.kernels import fastddc_pallas as fpk

    rates = list(map(float, shift_rates))
    c = len(rates)
    pis, post = ddc.post_input_size, ddc.post_decimation
    assert pis % post == 0, (pis, post)
    m = pis // post
    ov, ins = ddc.overlap_length, ddc.input_size
    pre, inv, fft = ddc.pre_decimation, ddc.fft_inv_size, ddc.fft_size
    mpad = mpad_for(ddc)
    tq2_np, wdft_np, w_np, d_np, frame_cyc = channelizer_arrays(ddc, rates)
    w1_np = fpk.pack_w(w_np, precision, mpad)
    dpad = np.zeros((c, mpad), np.complex64)
    dpad[:, :m] = d_np
    dft_prec = getattr(jax.lax.Precision, precision)

    ramp_cache: dict[int, tuple] = {}

    def _ramps(b: int):
        if b not in ramp_cache:
            r = np.mod(np.arange(b)[None, :] * frame_cyc[:, None], 1.0)
            ramp_cache[b] = (r.astype(np.float32),
                             np.mod(b * frame_cyc, 1.0).astype(np.float32))
        return ramp_cache[b]

    def init():
        return (CF.zeros((ov,)),
                jnp.zeros((c,), jnp.float32),
                CF(jnp.asarray(tq2_np.real), jnp.asarray(tq2_np.imag)),
                CF(jnp.asarray(wdft_np.real), jnp.asarray(wdft_np.imag)),
                CF(jnp.asarray(dpad.real), jnp.asarray(dpad.imag)),
                jnp.asarray(w1_np))

    def apply(state, x):
        tail, phases, tq2, wdft, d, w1 = state
        n = x.shape[0]
        assert n % ins == 0, f"chunk {n} % input_size {ins} != 0"
        b = n // ins
        frames = overlap_frames(x, tail, ins, ov)
        # subsequence split: x6[b, n2, n1] = frame[b, n2 + pre*n1]
        x6r = frames.re.reshape(b, inv, pre).swapaxes(1, 2)
        x6i = frames.im.reshape(b, inv, pre).swapaxes(1, 2)
        ein = lambda u, v: jnp.einsum(
            "bpn,nm->bpm", u, v, precision=dft_prec,
            preferred_element_type=jnp.float32)
        y2r = ein(x6r, wdft.re) - ein(x6i, wdft.im)      # (b, pre, inv)
        y2i = ein(x6r, wdft.im) + ein(x6i, wdft.re)
        s = CF(y2r.reshape(b, fft), y2i.reshape(b, fft))
        ramp, adv = _ramps(b)
        rot = expj(2.0 * np.pi * ((phases[:, None] + ramp) % 1.0))
        y = _inv_factored2_dispatch(s, tq2, d, w1, w_np, rot, m, precision)
        out = CF(y.re.reshape(c, b * m), y.im.reshape(c, b * m))
        counts = jnp.full((c,), b * m, jnp.int32)
        nstate = (x[n - ov:], (phases + adv) % 1.0, tq2, wdft, d, w1)
        return nstate, VarOut(out, counts)

    return Block("fastddc_channelizer_cc", init, apply)


# ---------------------------------------------------------------------------
# phase-classed fused inverse — ANY decimation as batched matmuls
# ---------------------------------------------------------------------------

def _class_plan(ddc: FastDDC):
    """Frame phase classes for post_input_size % post != 0.

    Frame b's first taken in-frame offset is t0 = (post - (b*pis) % post)
    % post, which cycles with period q = post / gcd(pis, post).  Returns
    (q, t0s, ms, m_max, S) where ms[o] is the per-class taken count and S
    is the 0/1 compaction matrix (q*m_max, q*pis//post) that packs the
    zero-padded per-frame outputs of one group back into the contiguous
    decimated stream (compaction as a tiny MXU matmul — a constant-index
    lane gather would be slow)."""
    pis, post = ddc.post_input_size, ddc.post_decimation
    q = post // int(np.gcd(pis, post))
    t0s = [(post - (b * pis) % post) % post for b in range(q)]
    ms = [int(np.ceil((pis - t0) / post)) for t0 in t0s]
    m_max = max(ms)
    total = q * pis // post
    assert sum(ms) == total
    s = np.zeros((q * m_max, total), np.float32)
    pos = 0
    for o in range(q):
        for i in range(ms[o]):
            s[o * m_max + i, pos] = 1.0
            pos += 1
    return q, t0s, ms, m_max, s


def channel_class_matrices(ddc: FastDDC, shift_rate: float):
    """Per-class fused matrices for one channel: (q, fft, m_max) complex64
    (zero-padded columns), plus dsa_rate (f64 cycles per taken sample).
    G[o] maps a raw spectrum directly to that class's taken time samples,
    with the in-frame NCO baked in (separable: taken index g = g0(b) + i)."""
    pis, post = ddc.post_input_size, ddc.post_decimation
    inv, scrap = ddc.fft_inv_size, ddc.scrap
    q, t0s, ms, m_max, _ = _class_plan(ddc)
    f = channel_matrix(ddc, shift_rate)                      # (fft, inv)
    ch = fastddc_init(ddc.transition_bw,
                      ddc.pre_decimation * ddc.post_decimation,
                      float(shift_rate), ddc.window)
    dsa = np.float64(np.float32(ch.post_shift)) * post
    k = np.arange(inv)[:, None]
    bvec = np.exp(2j * np.pi * np.mod(np.arange(m_max) * dsa, 1.0))
    g = np.zeros((q, ddc.fft_size, m_max), np.complex64)
    for o in range(q):
        t = scrap + t0s[o] + post * np.arange(ms[o])
        w = np.exp(2j * np.pi * (k + inv // 2) * t[None, :] / inv) / inv
        g[o, :, : ms[o]] = f @ (w * bvec[None, : ms[o]])
    return g, dsa


def _fastddc_inv_classed_block(ddc: FastDDC, rates,
                               spectra_order: str = "natural") -> Block:
    """Fused inverse for non-divisible post decimation (e.g. D=20, D=50):
    frames grouped by phase class via reshape (no gather), one batched
    complex matmul per chunk, per-frame NCO scalar, matmul compaction.

    Streaming continuity requires chunks of a multiple of q frames (the
    CLI/quantum layer enforces this); a lone unaligned chunk is padded and
    processed correctly one-shot."""
    pis, post = ddc.post_input_size, ddc.post_decimation
    q, t0s, ms, m_max, s_np = _class_plan(ddc)
    ga = q * pis // post                        # taken samples per group
    c = len(rates)
    cols = [channel_class_matrices(ddc, r) for r in rates]
    # layout (q, fft, C*m_max), channel-major column blocks
    g_np = np.concatenate([g for g, _ in cols], axis=2)
    if spectra_order == "kernel":
        # fold the matmul-FFT kernel's bin order into the spectral rows:
        # G_ko[perm[k]] = G_nat[k]  <=>  sum_j S_ko[j] G_ko[j] unchanged
        from csdr_tpu.kernels.fft_pallas import kernel_perm
        g_ko = np.empty_like(g_np)
        g_ko[:, kernel_perm(ddc.fft_size), :] = g_np
        g_np = g_ko
    dsa = np.asarray([d for _, d in cols], np.float64)       # (C,)
    # per-frame NCO base: g0(b) = (b*pis + t0[b%q]) / post = (b//q)*ga +
    # g0_local[b%q]; cycles = frac(g0 * dsa) via exact host ramps
    g0_local = np.asarray([(b * pis + t0s[b]) // post for b in range(q)],
                          np.float64)

    ramp_cache: dict[int, tuple] = {}

    def _ramps(bp: int):
        if bp not in ramp_cache:
            j = np.arange(bp // q, dtype=np.float64)[None, :, None]
            r = g0_local[None, None, :]
            cyc = np.mod((j * ga + r) * dsa[:, None, None], 1.0)
            ramp_cache[bp] = (cyc.astype(np.float32),        # (C, B/q, q)
                              np.mod((bp // q) * ga * dsa, 1.0)
                              .astype(np.float32))           # (C,) advance
        return ramp_cache[bp]

    def init():
        return (jnp.zeros((c,), jnp.float32),                # phase, cycles
                CF(jnp.asarray(g_np.real), jnp.asarray(g_np.imag)))

    def apply(state, spectra: CF):
        phases, g = state
        b = spectra.shape[0]
        bp = -(-b // q) * q
        if bp != b:
            z = jnp.zeros((bp - b, ddc.fft_size), jnp.float32)
            spectra = CF(jnp.concatenate([spectra.re, z]),
                         jnp.concatenate([spectra.im, z]))
        groups = bp // q
        sr = spectra.re.reshape(groups, q, -1).transpose(1, 0, 2)
        si = spectra.im.reshape(groups, q, -1).transpose(1, 0, 2)
        dot = lambda a, mm: jnp.einsum(
            "qgf,qfm->qgm", a, mm, precision=jax.lax.Precision.HIGH,
            preferred_element_type=jnp.float32)
        zr = dot(sr, g.re) - dot(si, g.im)        # (q, groups, C*m_max)
        zi = dot(sr, g.im) + dot(si, g.re)
        # -> (C, groups, q, m_max)
        zr = zr.reshape(q, groups, c, m_max).transpose(2, 1, 0, 3)
        zi = zi.reshape(q, groups, c, m_max).transpose(2, 1, 0, 3)
        ramp, adv = _ramps(bp)
        cyc = (phases[:, None, None] + ramp) % 1.0           # (C, B/q, q)
        rot = expj(2.0 * np.pi * cyc)
        yr = zr * rot.re[..., None] - zi * rot.im[..., None]
        yi = zr * rot.im[..., None] + zi * rot.re[..., None]
        # compaction: (C, groups, q*m_max) @ (q*m_max, ga)
        s_j = jnp.asarray(s_np)
        yr = jnp.einsum("gkm,mn->gkn", yr.reshape(c, groups, q * m_max),
                        s_j, precision=jax.lax.Precision.HIGHEST)
        yi = jnp.einsum("gkm,mn->gkn", yi.reshape(c, groups, q * m_max),
                        s_j, precision=jax.lax.Precision.HIGHEST)
        out = CF(yr.reshape(c, groups * ga), yi.reshape(c, groups * ga))
        count = -(-(b * pis) // post)             # ceil: true frames only
        counts = jnp.full((c,), count, jnp.int32)
        return ((phases + adv) % 1.0, g), VarOut(out, counts)

    return Block("fastddc_inv_cc", init, apply)
