"""FFT-domain FIR filtering: bandpass_fir_fft_cc, overlap-add
(reference csdr.c:1810-1886 + libcsdr.c:814-849 apply_fir_fft_cc).

Sizing mirrors the reference exactly: fft_size = next_pow2(taps_length),
doubled if the zero-pad headroom is < 200; input_size = fft_size - T + 1;
overlap = T - 1.

TPU design: B frames per chunk -> ONE batched planar FFT / IFFT (the VMEM
matmul-FFT kernel pair on TPU, with the taps spectrum pre-permuted to the
kernel's bin order so nothing reorders at runtime).  The overlap-add is
the reference's exact accumulate-then-split semantics expressed as J+1
shifted batched adds (J = ceil(fft/input) - 1): fully parallel, no scan,
correct even when overlap > input_size (wide-taps plans).  The reference's
double-buffered inverse plans (csdr.c:1855-1879) exist only to keep the
previous tail alive; here that is simply the carried state.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from csdr_tpu import firdes
from csdr_tpu.core import fft as cfft
from csdr_tpu.core.block import Block
from csdr_tpu.core.cplx import CF


def fftfilt_plan(taps_length: int):
    fft_size = cfft.next_pow2(taps_length)
    if fft_size - taps_length < 200:
        fft_size <<= 1
    input_size = fft_size - taps_length + 1
    overlap = taps_length - 1
    return fft_size, input_size, overlap


def _taps_fft(taps: np.ndarray, fft_size: int) -> np.ndarray:
    padded = np.zeros(fft_size, np.complex128)
    padded[: len(taps)] = taps
    return np.fft.fft(padded).astype(np.complex64)


def apply_fir_fft_cc_batch(x: CF, taps_fft: CF, input_size: int, carry: CF,
                           taps_fft_ko: CF | None = None):
    """x: (B, fft_size) frames (already zero-padded);
    returns (y (B, input_size), new_carry (overlap,)).
    Matches libcsdr.c:814-849 including the 1/fft_size normalization.

    When ``taps_fft_ko`` (the taps spectrum in the VMEM kernel's bin order)
    is given and the shape qualifies, the fwd->multiply->inv round trip runs
    the matmul-FFT pallas pair (kernels/fft_pallas.py) — the pointwise
    product happens in kernel bin order, so NO bin reordering ever runs."""
    import jax
    import os
    from csdr_tpu.kernels import fft_pallas as fk

    fft_size = x.shape[-1]
    overlap = fft_size - input_size
    if taps_fft_ko is not None and fk.use_kernel(fft_size, x.shape[0]):
        xf = fk.fft_ko(x)
        yf = xf * taps_fft_ko
        yk = fk.ifft_ko(yf)
        y = CF(yk.re * (1.0 / fft_size), yk.im * (1.0 / fft_size))
    else:
        xf = cfft.fft(x)
        yf = xf * taps_fft
        y = cfft.ifft(yf, normalize=True)         # (B, fft_size)
    # Overlap-add in the reference's exact form: every frame's FULL
    # fft_size result accumulates at offset b*input_size (the C adds the
    # carry into the whole result buffer before splitting emit/tail,
    # libcsdr.c:844-849) — so overlap may EXCEED input_size (taps in
    # (fft/2, fft-200]: transition_bw ~ 0.013-0.016) and the tail cascades
    # several frames ahead.  Batched: J+1 shifted adds, no scan.
    b = x.shape[0]
    jmax = -(-fft_size // input_size) - 1          # frames a tail can span
    pad_cols = (jmax + 1) * input_size - fft_size
    out_len = (b + jmax) * input_size

    def acc(plane):
        zp = jnp.concatenate(
            [plane, jnp.zeros((b, pad_cols), plane.dtype)], axis=1)
        out = jnp.zeros((out_len,), plane.dtype)
        for j in range(jmax + 1):
            seg = zp[:, j * input_size: (j + 1) * input_size].reshape(-1)
            out = jax.lax.dynamic_update_slice(
                out, jax.lax.dynamic_slice(
                    out, (j * input_size,), (b * input_size,)) + seg,
                (j * input_size,))
        return out

    out_re, out_im = acc(y.re), acc(y.im)
    out_re = out_re.at[:overlap].add(carry.re)
    out_im = out_im.at[:overlap].add(carry.im)
    emit = CF(out_re[: b * input_size].reshape(b, input_size),
              out_im[: b * input_size].reshape(b, input_size))
    new_carry = CF(
        jax.lax.dynamic_slice(out_re, (b * input_size,), (overlap,)),
        jax.lax.dynamic_slice(out_im, (b * input_size,), (overlap,)))
    return emit, new_carry


def bandpass_taps_spectra(transition_bw: float, low_cut: float,
                          high_cut: float,
                          window: str = firdes.WINDOW_DEFAULT):
    """Device taps spectra for one band: (taps_fft CF (fft,), taps_fft_ko
    CF|None).  The ko form is the matmul-FFT kernel's bin order
    (H_ko[perm] = H_nat); None when the kernel doesn't support the plan."""
    taps_length = firdes.firdes_filter_len(transition_bw)
    fft_size, _input_size, _overlap = fftfilt_plan(taps_length)
    taps = firdes.firdes_bandpass_c(taps_length, low_cut, high_cut, window)
    tf = _taps_fft(taps, fft_size)
    taps_fft = CF(jnp.asarray(tf.real), jnp.asarray(tf.imag))
    from csdr_tpu.kernels.fft_pallas import kernel_perm, supported
    taps_fft_ko = None
    if supported(fft_size, 1):
        tko = np.empty_like(tf)
        tko[kernel_perm(fft_size)] = tf
        taps_fft_ko = CF(jnp.asarray(tko.real), jnp.asarray(tko.imag))
    return taps_fft, taps_fft_ko


def bandpass_fir_fft_block(low_cut: float, high_cut: float, transition_bw: float,
                           window: str = firdes.WINDOW_DEFAULT,
                           name: str = "bandpass_fir_fft_cc") -> Block:
    """Streaming overlap-add complex bandpass.  Chunk must be a multiple of
    input_size; output length == input length (rate preserving).

    The taps spectra ride the STATE pytree (traced arguments), so a FIFO
    retune (cli bandpass_fir_fft_cc --fifo) swaps them via
    bandpass_taps_spectra without retracing — as a closure constant the
    jitted graph would keep the original band forever."""
    taps_length = firdes.firdes_filter_len(transition_bw)
    fft_size, input_size, overlap = fftfilt_plan(taps_length)
    taps_fft, taps_fft_ko = bandpass_taps_spectra(
        transition_bw, low_cut, high_cut, window)

    def init():
        return (CF.zeros((overlap,)), taps_fft, taps_fft_ko)

    def apply(state, x):
        carry, tfft, tfft_ko = state
        n = x.shape[0]
        assert n % input_size == 0, f"chunk {n} % input_size {input_size} != 0"
        b = n // input_size
        frames = x.reshape(b, input_size)
        z = jnp.zeros((b, fft_size - input_size), jnp.float32)
        frames = CF(jnp.concatenate([frames.re, z], axis=1),
                    jnp.concatenate([frames.im, z], axis=1))
        y, carry = apply_fir_fft_cc_batch(frames, tfft, input_size, carry,
                                          taps_fft_ko=tfft_ko)
        return (carry, tfft, tfft_ko), y.reshape(-1)

    blk = Block(name, init, apply)
    # expose sizing for chunk planning (CLI layer / models); Block is a
    # frozen dataclass so attach via object.__setattr__
    object.__setattr__(blk, "fft_size", fft_size)
    object.__setattr__(blk, "input_size", input_size)
    object.__setattr__(blk, "overlap", overlap)
    return blk
