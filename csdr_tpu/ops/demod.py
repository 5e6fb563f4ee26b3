"""Analog demodulators & de-emphasis (SURVEY.md §2.6).  Planar CF inputs.

All are elementwise / shift-by-one ops — pure VPU work fused by XLA — except
the de-emphasis IIR, which is a 1-pole filter computed as an associative scan
(log-depth, block-parallel) instead of the reference's serial loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from csdr_tpu.core.block import Block, VarOut
from csdr_tpu.core.cplx import CF

# Reference scaling constant (libcsdr.c:1020-1021):
FMDEMOD_QUADRI_K = 0.340447550238101026565118445432744920253753662109375


def fmdemod_quadri_cf(x: CF, last_sample: CF | None = None):
    """Quadri-correlator FM discriminator (reference libcsdr.c:1039-1071):
    y = K*(i*dq - q*di)/(i^2+q^2), with dq/di vs previous sample; the first
    sample differentiates against ``last_sample`` (0 at stream start).
    Returns (y, new_last_sample)."""
    if last_sample is None:
        last_sample = CF.scalar(0.0)
    prev_re = jnp.concatenate([jnp.reshape(last_sample.re, (1,)), x.re[:-1]])
    prev_im = jnp.concatenate([jnp.reshape(last_sample.im, (1,)), x.im[:-1]])
    di = x.re - prev_re
    dq = x.im - prev_im
    num = x.re * dq - x.im * di
    den = x.abs2()
    y = jnp.where(den != 0, FMDEMOD_QUADRI_K * num / den, 0.0).astype(jnp.float32)
    return y, x[-1]


def fmdemod_quadri_block() -> Block:
    def init():
        return CF.scalar(0.0)

    def apply(last, x):
        y, last = fmdemod_quadri_cf(x, last)
        return last, y

    return Block("fmdemod_quadri_cf", init, apply)


def fmdemod_atan_cf(x: CF, last_phase=0.0):
    """Phase-difference discriminator (reference libcsdr.c:1004-1019):
    y = wrap(arg(x[n]) - arg(x[n-1]))/pi.  Returns (y, next_last_phase).
    NOTE the reference uses argof = atan2(q, i)."""
    phase = x.angle()
    prev = jnp.concatenate([jnp.reshape(jnp.asarray(last_phase, jnp.float32), (1,)), phase[:-1]])
    dphase = phase - prev
    dphase = jnp.where(dphase < -np.pi, dphase + 2 * np.pi, dphase)
    dphase = jnp.where(dphase > np.pi, dphase - 2 * np.pi, dphase)
    return (dphase / np.pi).astype(jnp.float32), phase[-1]


def fmdemod_atan_block() -> Block:
    def init():
        return jnp.float32(0.0)

    def apply(last, x):
        y, last = fmdemod_atan_cf(x, last)
        return last, y

    return Block("fmdemod_atan_cf", init, apply)


def amdemod_cf(x: CF):
    """Magnitude AM demod (reference libcsdr.c:861-873)."""
    return x.abs().astype(jnp.float32)


def amdemod_estimator_cf(x: CF, alpha=0.0, beta=0.0):
    """alpha*max(|i|,|q|) + beta*min(|i|,|q|) magnitude estimate
    (reference libcsdr.c:875-901; defaults minimize RMS error)."""
    if alpha == 0:
        alpha, beta = 0.947543636291, 0.392485425092
    ai, aq = jnp.abs(x.re), jnp.abs(x.im)
    return (alpha * jnp.maximum(ai, aq) + beta * jnp.minimum(ai, aq)).astype(jnp.float32)


def realpart_cf(x: CF):
    """SSB demod tail: take I (reference csdr.c:634-645)."""
    return x.re


def _affine_prefix_2level(bs, as_, y0, chunk: int = 1024):
    """Prefix of y <- b*y + a over (mul, add) pairs, TWO-LEVEL in a
    COLUMN-MAJOR (SUB, 128) layout: per-column scans run along the
    SUBLANE axis (measured ~13x faster than lane-axis scans on this
    backend: 6 vs 82 us at 49k elements) + a 128-lane carry scan over the
    column totals + a broadcast apply.  Sample i lives at row i % SUB of
    column i // SUB; inputs are padded with identity elements (b=1, a=0).
    (`chunk` is kept for API compatibility; the layout fixes C=128.)"""
    n = bs.shape[0]
    c_cols = 128
    sub = -(-n // c_cols)
    pad = sub * c_cols - n
    if pad:
        bs = jnp.concatenate([bs, jnp.ones((pad,), jnp.float32)])
        as_ = jnp.concatenate([as_, jnp.zeros((pad,), jnp.float32)])
    bm = bs.reshape(c_cols, sub).T          # [r, j]: sample j*sub + r
    am = as_.reshape(c_cols, sub).T

    def combine(l, r):
        bl, al = l
        br, ar = r
        return bl * br, al * br + ar

    cb, ca = jax.lax.associative_scan(combine, (bm, am), axis=0)
    gb, ga = jax.lax.associative_scan(combine, (cb[-1, :], ca[-1, :]))
    y0f = jnp.asarray(y0, jnp.float32)
    y_in = jnp.concatenate([jnp.reshape(y0f, (1,)),
                            gb[:-1] * y0f + ga[:-1]])   # column entries
    y = cb * y_in[None, :] + ca
    return y.T.reshape(-1)[:n]


def _one_pole_scan(x, alpha, y0):
    """y[n] = alpha*x[n] + (1-alpha)*y[n-1] via associative scan.

    The recurrence y = a*x + b*y_prev composes associatively over (mul, add)
    pairs, so a serial 1-pole IIR becomes a log-depth parallel scan — the
    block-parallel reformulation SURVEY.md §7 calls for (vs the reference's
    serial loop libcsdr.c:1094-1096)."""
    n = x.shape[0]
    bs = jnp.full((n,), 1.0 - alpha, jnp.float32)
    as_ = (alpha * x).astype(jnp.float32)
    return _affine_prefix_2level(bs, as_, y0)


def _one_pole_scan_masked(x, alpha, y0, mask):
    """Masked 1-pole: invalid samples are identity elements (1, 0) so the
    carry skips them — how VarOut streams (SURVEY.md §7) flow through IIRs."""
    b = jnp.where(mask, 1.0 - alpha, 1.0).astype(jnp.float32)
    a = jnp.where(mask, alpha * x, 0.0).astype(jnp.float32)
    return _affine_prefix_2level(b, a, y0)


def deemphasis_wfm_ff(x, tau, sample_rate, last_output=0.0):
    """WFM de-emphasis: 1-pole IIR LPF, alpha = dt/(tau+dt)
    (reference libcsdr.c:1081-1097).  Returns (y, next_last_output)."""
    dt = 1.0 / sample_rate
    alpha = dt / (tau + dt)
    y = _one_pole_scan(x, alpha, jnp.asarray(last_output, jnp.float32))
    return y, y[-1]


def deemphasis_wfm_block(tau: float, sample_rate: int) -> Block:
    """Streaming WFM de-emphasis.

    At audio alphas the 1-pole IIR's impulse response a*b^j dies below
    f32 resolution within a few dozen samples, so the recurrence IS a
    short FIR exactly: y[n] = sum_{j<K} a*b^j x[n-j] with b^K < 1e-8.
    That runs as one tiny frames@taps MXU matmul (~10 us at 48k samples)
    instead of a log-depth associative scan (~127 us measured) — and the
    carried state becomes the K-1 input tail, which also subsumes the
    reference's last_output carry (the >K-sample history contributes
    < 1e-8 relative).  Falls back to the affine scan when alpha is so
    small that K would exceed 256 taps."""
    dt = 1.0 / sample_rate
    alpha = dt / (tau + dt)
    b = 1.0 - alpha
    # kf >= 2 so the carried tail is never 0-length (xcat[-0:] would be
    # the WHOLE array, growing the state each chunk)
    k_needed = max(2, int(np.ceil(np.log(1e-8) / np.log(max(b, 1e-12))))) \
        if 0.0 < b < 1.0 else 2
    use_fir = k_needed <= 256

    if not use_fir:
        def init():
            return jnp.float32(0.0)

        def apply(last, x):
            if isinstance(x, VarOut):
                mask = jnp.arange(x.data.shape[0]) < x.count
                y = _one_pole_scan_masked(x.data, alpha, last, mask)
                nidx = jnp.maximum(x.count - 1, 0)
                return y[nidx], VarOut(y, x.count)
            y, last = deemphasis_wfm_ff(x, tau, sample_rate, last)
            return last, y

        return Block("deemphasis_wfm_ff", init, apply)

    kf = k_needed
    # correlation-form taps: apply_real_fir_ff computes sum_t T[t]*x[i+t],
    # so T[t] = a*b^(K-1-t) places the newest sample at weight a
    taps_np = (alpha * np.power(b, np.arange(kf - 1, -1, -1))
               ).astype(np.float32)
    taps_j = jnp.asarray(taps_np)

    def init():
        return jnp.zeros((kf - 1,), jnp.float32)

    def apply(tail, x):
        from csdr_tpu.ops.fir import apply_real_fir_ff
        if isinstance(x, VarOut):
            xcat = jnp.concatenate([tail, x.data.astype(jnp.float32)])
            y = apply_real_fir_ff(xcat, taps_j)[: x.data.shape[0]]
            # valid samples are the PREFIX [0, count): the last K-1 valid
            # inputs start at xcat[count]
            new_tail = jax.lax.dynamic_slice(xcat, (x.count,), (kf - 1,))
            return new_tail, VarOut(y, x.count)
        xcat = jnp.concatenate([tail, x.astype(jnp.float32)])
        y = apply_real_fir_ff(xcat, taps_j)[: x.shape[0]]
        return xcat[-(kf - 1):], y

    return Block("deemphasis_wfm_ff", init, apply)


def deemphasis_nfm_ff(x, sample_rate: int):
    """NFM de-emphasis: fixed FIR per sample rate (reference
    libcsdr.c:1099-1128 + predefined.h).  Stateless valid-mode FIR."""
    from csdr_tpu import firdes
    from csdr_tpu.ops.fir import apply_real_fir_ff

    taps = firdes.deemphasis_nfm_taps(sample_rate)
    return apply_real_fir_ff(x, jnp.asarray(taps))


def deemphasis_nfm_block(sample_rate: int) -> Block:
    """Streaming NFM de-emphasis (tail-carried FIR)."""
    from csdr_tpu import firdes
    from csdr_tpu.ops.fir import apply_real_fir_ff

    taps = jnp.asarray(firdes.deemphasis_nfm_taps(sample_rate))
    t = taps.shape[0]

    def init():
        return jnp.zeros((t - 1,), jnp.float32)

    def apply(tail, x):
        xcat = jnp.concatenate([tail, x])
        y = apply_real_fir_ff(xcat, taps)[: x.shape[0]]
        return xcat[x.shape[0]:], y

    return Block("deemphasis_nfm_ff", init, apply, warmup_out=t - 1)
