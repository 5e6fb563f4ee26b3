"""Carrier & timing recovery loops (SURVEY.md §2.9): PLL, BPSK Costas loop,
Gardner/early-late timing recovery.

These are genuinely serial per-sample (or per-symbol) nonlinear feedback
loops — SURVEY.md §7 kernel tier 3 — so they run as lax.scan, placed at the
decimated symbol/audio rates where scan throughput is ample.  State carries
are exact mirrors of the reference's POD structs, so outputs are
sample-for-sample comparable.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from csdr_tpu.core.block import Block, VarOut
from csdr_tpu.core.cplx import CF

TWO_PI = 2.0 * np.pi


def _wrap_pi(p):
    """while(p>pi) p-=2pi; while(p<-pi) p+=2pi;"""
    return (p + np.pi) % TWO_PI - np.pi


# --------------------------------------------------------------------------
# PLL (reference libcsdr.c:1844-1915)
# --------------------------------------------------------------------------

def pll_loop_params(bandwidth: float, ko: float = 10.0, kd: float = 0.1,
                    damping_factor: float = 0.707):
    """PI controller gains (reference pll_cc_init_pi_controller,
    libcsdr.c:1849-1858; the reference CLI defaults ko=10, kd=0.1 —
    csdr.c:2546)."""
    bw = TWO_PI * bandwidth
    alpha = (damping_factor * 2 * bw) / (ko * kd)
    beta = (bw * bw) / (ko * kd)
    return alpha, beta


def pll_cc(x: CF, alpha: float, beta: float | None = None,
           state=(0.0, 0.0, 0.0)):
    """PLL: atan2 phase detector, P or PI loop filter
    (reference pll_cc, libcsdr.c:1870-1915).  beta=None -> P controller.
    Returns (dphase_out, nco: CF, state').  NOTE the reference NCO is
    sin+j*cos and the detector is atan2(i, q) — mirrored exactly."""

    def step(carry, xi):
        output_phase, dphase, iir = carry
        output_phase = _wrap_pi(output_phase + dphase)
        nco_re = jnp.sin(output_phase)
        nco_im = jnp.cos(output_phase)
        input_phase = jnp.arctan2(xi[0], xi[1])
        new_dphase = _wrap_pi(input_phase - output_phase)
        if beta is None:
            dphase = new_dphase * alpha
        else:
            dphase = _wrap_pi(new_dphase * alpha + iir)
            iir = iir + new_dphase * beta
        return (output_phase, dphase, iir), (-dphase, nco_re, nco_im)

    init = tuple(jnp.float32(v) for v in state)
    carry, (dph, nr, ni) = jax.lax.scan(step, init, jnp.stack([x.re, x.im], axis=1), unroll=32)
    return dph, CF(nr, ni), carry


def pll_block(bandwidth: float = 0.01, pi_controller: bool = True,
              output: str = "dphase") -> Block:
    alpha, beta = pll_loop_params(bandwidth)
    if not pi_controller:
        alpha, beta = bandwidth, None   # P controller: alpha given directly

    def init():
        return (jnp.float32(0), jnp.float32(0), jnp.float32(0))

    def apply(state, x):
        dph, nco, state = pll_cc(x, alpha, beta, state)
        return state, dph if output == "dphase" else nco

    return Block("pll_cc", init, apply)


# --------------------------------------------------------------------------
# BPSK Costas loop (reference libcsdr.c:2094-2142)
# --------------------------------------------------------------------------

def costas_loop_params(bandwidth: float = 0.01,
                       damping_factor: float = 0.707):
    """alpha/beta from bandwidth+damping (reference init_bpsk_costas_loop_cc,
    libcsdr.c:2094-2106, gnuradio-style).  ``bandwidth`` is the reference's
    parameter BEFORE the 2*pi (its comment: "bandwidth should be around
    0.01 by default (2pi/100)" — i.e. omega = 2*pi*0.01)."""
    bw = TWO_PI * bandwidth
    denom = 1 + 2 * damping_factor * bw + bw * bw
    alpha = (4 * damping_factor * bw) / denom
    beta = (4 * bw * bw) / denom
    dphase_max = bw
    return alpha, beta, dphase_max


def bpsk_costas_loop_cc(x: CF, alpha, beta, dphase_max,
                        decision_directed: bool = False,
                        dphase_max_reset_to_zero: bool = False,
                        state=(0.0, 0.0, 0.0)):
    """Costas loop (reference bpsk_costas_loop_cc, libcsdr.c:2108-2142).
    state = (nco_phase, current_freq, dphase).  Returns
    (y: CF, error, dphase_out, state')."""

    def step(carry, xi):
        nco_phase, freq, dphase = carry
        nco_re = jnp.cos(nco_phase)
        nco_im = jnp.sin(nco_phase)
        yre = xi[0] * nco_re - xi[1] * nco_im
        yim = xi[0] * nco_im + xi[1] * nco_re
        if decision_directed:
            op = jnp.arctan2(yim, yre)
            err_in = jnp.where(jnp.abs(op) < np.pi / 2, -op,
                               _wrap_pi(np.pi - op))
            error = err_in
        else:
            error = np.pi * yre * yim
        freq = freq + error * beta
        dphase = error * alpha + freq
        over = dphase > dphase_max
        under = dphase < -dphase_max
        if dphase_max_reset_to_zero:
            dphase = jnp.where(over | under, 0.0, dphase)
        else:
            dphase = jnp.where(over, dphase_max,
                               jnp.where(under, -dphase_max, dphase))
        nco_phase = nco_phase + dphase
        # while(nco_phase > 2pi) -= 2pi; while(nco_phase <= 0) += 2pi
        nco_phase = nco_phase % TWO_PI
        nco_phase = jnp.where(nco_phase <= 0, nco_phase + TWO_PI, nco_phase)
        return (nco_phase, freq, dphase), (yre, yim, error, dphase)

    init = tuple(jnp.float32(v) for v in state)
    carry, (yr, yi, err, dph) = jax.lax.scan(
        step, init, jnp.stack([x.re, x.im], axis=1), unroll=32)
    return CF(yr, yi), err, dph, carry


def costas_block(bandwidth: float = 0.01, damping: float = 0.707,
                 decision_directed: bool = False) -> Block:
    alpha, beta, dmax = costas_loop_params(bandwidth, damping)

    def init():
        return (jnp.float32(0), jnp.float32(0), jnp.float32(0))

    def apply(state, x):
        y, _e, _d, state = bpsk_costas_loop_cc(
            x, alpha, beta, dmax, decision_directed, state=state)
        return state, y

    return Block("bpsk_costas_loop_cc", init, apply)


# --------------------------------------------------------------------------
# Gardner / early-late timing recovery (reference libcsdr.c:1960-2072)
# --------------------------------------------------------------------------

GARDNER = "GARDNER"
EARLYLATE = "EARLYLATE"


def timing_recovery_block(algorithm: str, decimation: int, loop_gain: float = 0.5,
                          max_error: float = 2.0, use_q: bool = False,
                          output: str = "symbols", segments: int = 1,
                          warmup_symbols: int = 32) -> Block:
    """Non-data-aided symbol synchronizer (reference timing_recovery_cc,
    libcsdr.c:1977-2072), decimation = samples/symbol (divisible by 4).

    Data-dependent stride (bitstart += decimation + correction) -> lax.scan
    over symbol slots with a carried input buffer, VarOut outputs
    (SURVEY.md §7 "hard parts" #1).  output: 'symbols' | 'error' | 'indexes'.

    segments > 1 enables the overlap-discard segmented mode (the feedback-
    loop analog of overlap-save): the chunk's sample range is split into
    ``segments`` position spans scanned IN PARALLEL (one vmapped scan of
    ~cap/segments steps instead of a cap-step serial scan).  WHEN THIS
    PAYS (r4 on-chip): only when the scan is dispatch-latency-bound —
    few channels and many symbols per chunk (cap/segments >> the warmup).
    At the 64-channel flagship shape it LOSES (554 -> 274 Msps at S=4,
    178 at S=8): with ~103 symbols/chunk the per-segment warmup multiplies
    total steps 2.4-3.8x, and the 64-wide vmapped scan is already gather-
    throughput-bound, so extra parallel lanes don't amortize dispatch.
    The flagship's actual modem wall was the streaming carry (fixed in r4,
    see apply below); serial segments=1 stays the default everywhere.
    Chunks too small to give every segment >= warmup_symbols symbols fall
    back to the serial scan (trace-time, static in the chunk shape):
    shorter spans are warmup-dominated and their seams can duplicate or
    skip symbols (the dedup checks only the immediate predecessor).
    Segment s>0 starts ``warmup_symbols`` symbols before its span and
    discards them while the loop acquires; a converged loop's integer
    trajectory coalesces with the serial one, so emitted symbols match the
    serial mode after lock (tested on the BPSK31 fixture).  Segment 0 and
    the streaming carry (buffer/occ/corr) continue the previous chunk
    exactly.  Caveat: a loop railed hard enough to stall inside one span
    loses that span's remainder instead of lagging — the drop-oldest
    overload policy, applied per span.  The default segments=1 is the
    exact reference-parity serial scan.
    """
    assert decimation % 4 == 0, "decimation must be divisible by 4"
    nsb = decimation
    nshb = decimation // 2
    nsqb = decimation // 4
    wing = int(nsb * 0.25)          # earlylate_ratio = 0.25 (init, :1971)
    gardner = algorithm.upper() == GARDNER
    err_sign = -1.0 if gardner else 1.0
    margin = 4 * nsb
    assert segments >= 1
    # sample picks relative to bitstart: (right, left, mid); the emitted
    # symbol is left for Gardner, mid for early-late (reference :2006-2031)
    if gardner:
        offs_np = np.array([nshb * 3, nshb, nshb * 2], np.int32)
        out_slot = 1
    else:
        offs_np = np.array([wing * 3, wing, nshb], np.int32)
        out_slot = 2
    corr_sel = np.array([0, 1, 0], np.int32)    # early-late: left -= corr

    def init(n: int | None = None):
        # the carry is a FIXED (margin,) tail regardless of chunk size; the
        # n parameter is accepted for API compatibility and ignored
        return None if n is None else _mk()

    def _mk():
        return (CF.zeros((margin,)), jnp.int32(0), jnp.int32(0))

    def _shift_left(a, k):
        """a shifted left by traced k, zero-filled (static output size)."""
        return jax.lax.dynamic_slice(
            jnp.concatenate([a, jnp.zeros_like(a)]), (k,), (a.shape[0],))

    # static pick-window geometry for the rowslice form: all picks fall in
    # [bitstart + pick_lo, bitstart + pick_hi] (EARLYLATE's left pick moves
    # by -corr, |corr| < nsqb after the reset)
    if gardner:
        pick_lo, pick_hi = nshb, nshb * 3
    else:
        pick_lo, pick_hi = wing - nsqb, max(wing * 3, nshb) + nsqb
    n_rows = (pick_hi - pick_lo) // 128 + 2

    def _step_fn(bufobj, size, span_hi, emit_lo, rowslice):
        """One symbol slot.  Two pick forms, bit-identical outputs:

        rowslice=False: bufobj = (2, size) stacked re/im, picks via ONE
        batched dynamic gather per step.
        rowslice=True: bufobj = (2, rowsp, 128) row-tiled; picks via a
        dynamic_slice of n_rows SUBLANE rows + a one-hot lane contraction.
        On TPU the in-scan gather cost scales with the gather DOMAIN
        (~1.5 ms per 64x52k-sample chunk); the row window caps the domain
        at n_rows*128 lanes — measured 2.7x faster at the flagship shape
        (r4, docs/ROUND4.md).

        span_hi/emit_lo None = serial mode (emission == alive)."""
        offs = jnp.asarray(offs_np)
        sel = jnp.asarray(corr_sel)
        if rowslice:
            rowsp = bufobj.shape[1]
            iota = jnp.arange(n_rows * 128, dtype=jnp.int32).reshape(
                n_rows, 128)

        def step(carry, _):
            bitstart, corr, alive_so_far = carry
            alive = alive_so_far & (bitstart + nshb * 3 < size)
            if span_hi is not None:
                alive = alive & (bitstart < span_hi)
            # correction reset (reference :2000-2004)
            corr = jnp.where((corr <= -nsqb * 0.9) | (corr >= 0.9 * nsqb),
                             0, corr)
            gi = bitstart + offs
            if not gardner:
                gi = gi - corr * sel
            gi = jnp.clip(gi, 0, size - 1)
            if rowslice:
                row0 = jnp.clip(jnp.min(gi) // 128, 0, rowsp - n_rows)
                win = jax.lax.dynamic_slice(
                    bufobj, (0, row0, 0), (2, n_rows, 128))
                oh = (iota[None, :, :]
                      == (gi - row0 * 128)[:, None, None]).astype(jnp.float32)
                # HIGHEST keeps the 0/1-weighted pick f32-exact on TPU —
                # a default-precision dot would bf16-round the samples and
                # break bit-equality with the gather pick (same rule as
                # the one-hot subsample in ops/resamp.py)
                v = jnp.einsum("wrl,prl->wp", win, oh,
                               precision=jax.lax.Precision.HIGHEST)  # (2, 3)
            else:
                v = bufobj[:, gi]               # (2, 3): re/im x r,l,m
            d = (v[:, 0] - v[:, 1]) * v[:, 2]
            if use_q:
                error = (d[0] + d[1]) / 2
            else:
                error = d[0]
            raw_error = error
            error = jnp.clip(error, -max_error, max_error)
            new_corr = (nshb * err_sign * error * loop_gain).astype(jnp.int32)
            new_bitstart = bitstart + nsb + new_corr
            out_idx = bitstart + nshb           # == left (gardner) == mid (EL)
            emit = alive if emit_lo is None else alive & (bitstart >= emit_lo)
            bs = jnp.where(alive, new_bitstart, bitstart)
            cr = jnp.where(alive, new_corr, corr)
            return (bs, cr, alive), (v[0, out_slot], v[1, out_slot],
                                     raw_error, out_idx, emit)

        return step

    def _pick_output(yr, yi, errs, idxs, emits, s0):
        if output == "symbols":
            return CF(jnp.where(emits, yr, 0.0), jnp.where(emits, yi, 0.0))
        if output == "error":
            return jnp.where(emits, errs, 0.0)
        # indexes are reported relative to the first unconsumed sample —
        # the reference's buffer origin (it memmoves the tail to the front,
        # csdr.c:2641-2642); s0 is that origin inside our static buffer
        return jnp.where(emits, idxs - s0, 0)

    def apply(state, x):
        n = x.shape[0]
        if state is None:
            state = _mk()
        tail, occ, corr0 = state
        # Fixed-margin streaming carry: buffer = [tail (margin,) | x] via
        # ONE static concat; the valid region is [margin-occ, margin+n) and
        # only the scan's (traced) start position knows about occ.  The
        # previous form kept a (n+margin,) ring updated with traced-start
        # dynamic_update_slice/dynamic_slice — on TPU each such pass runs
        # at ~170 GB/s over the whole stream, and at the flagship shape
        # that buffer plumbing cost ~4x the symbol scan itself (r4 on-chip
        # decomposition: scan 0.32 ms vs ~1.7 ms modem total).
        xcat = CF(jnp.concatenate([tail.re, x.re]),
                  jnp.concatenate([tail.im, x.im]))
        size = margin + n                   # static scan bound
        s0 = jnp.int32(margin) - occ        # traced: first unconsumed sample
        pad = (-size) % 128
        rowsp = (size + pad) // 128
        # CSDR_TED_ROWSLICE=1 opts into the row-window pick.  Standalone it
        # measures 2.7x faster than the gather (0.56 vs 1.52 ms at the
        # flagship shape), but COMPOSED into the sharded flagship program
        # it loses 6% (1228 vs 1311 Msps, r4 A/B) — the scan overlaps
        # other work there and the extra per-step ops cost more than the
        # smaller gather domain saves.  Gather stays the default.
        rowslice = rowsp >= n_rows and os.environ.get(
            "CSDR_TED_ROWSLICE", "0") == "1"
        if rowslice:
            z = jnp.zeros((pad,), jnp.float32)
            bufobj = jnp.stack([jnp.concatenate([xcat.re, z]),
                                jnp.concatenate([xcat.im, z])]
                               ).reshape(2, rowsp, 128)
        else:
            bufobj = jnp.stack([xcat.re, xcat.im])

        # degenerate-span guard: a segment shorter than its own warmup is
        # warmup-dominated and its seams degrade — dedup only checks the
        # immediate predecessor, so ~1-symbol spans can emit duplicate or
        # skipped symbols (r4 review).  Fall back to the serial scan when
        # the chunk cannot give every segment >= warmup_symbols symbols
        # (static in the chunk shape, so this is a trace-time choice).
        # conservative worst case: the actual data is n + occ samples and
        # occ may be 0, so guard on n alone — the optimistic (n + margin)
        # bound could admit chunks up to margin/(segments*nsb) symbols
        # short of warmup per segment (r4 advisor)
        segments_eff = segments
        if segments > 1 and n // (segments * nsb) < warmup_symbols:
            segments_eff = 1

        if segments_eff == 1:
            cap = (n + margin) // nsb + 2
            step = _step_fn(bufobj, size, None, None, rowslice)
            (bitstart, corr, _), (yr, yi, errs, idxs, emits) = jax.lax.scan(
                step, (s0, corr0, jnp.bool_(True)), None,
                length=cap, unroll=8)
            count = jnp.sum(emits.astype(jnp.int32))
            data = _pick_output(yr, yi, errs, idxs, emits, s0)
        else:
            s_count = segments
            warm = warmup_symbols
            span = (size - s0) // s_count                # traced span length
            cap_seg = (n + margin) // (s_count * nsb) + warm + 4
            s_idx = jnp.arange(s_count, dtype=jnp.int32)
            emit_lo = s0 + s_idx * span
            # each non-last segment OVERRUNS its span by one symbol so the
            # seam gap is always covered by the predecessor; the successor's
            # overlapping leading emissions are removed by the dedup below
            span_hi = jnp.where(s_idx == s_count - 1,
                                jnp.int32(np.iinfo(np.int32).max),
                                emit_lo + span + nsb)
            bs0 = jnp.maximum(emit_lo - warm * nsb, s0)  # segment 0: s0
            corr_init = jnp.where(s_idx == 0, corr0, 0)

            def seg(bs_i, c_i, lo, hi):
                step = _step_fn(bufobj, size, hi, lo, rowslice)
                (bse, cre, _), outs = jax.lax.scan(
                    step, (bs_i, c_i, jnp.bool_(True)), None,
                    length=cap_seg, unroll=8)
                return bse, cre, outs

            bse, cre, (yr, yi, errs, idxs, emits) = jax.vmap(seg)(
                bs0, corr_init, emit_lo, span_hi)
            # per-segment emissions are a contiguous run (bitstart is
            # monotone): mask, shift each run to the segment's front, then
            # pack runs back-to-back.  Later dus writes overwrite earlier
            # segments' garbage tails, so the result is a valid prefix.
            counts = jnp.sum(emits.astype(jnp.int32), axis=1)
            starts = jnp.argmax(emits, axis=1).astype(jnp.int32)
            data_seg = _pick_output(yr, yi, errs, idxs, emits, s0)
            # seam dedup: two independently-locked loops straddle a span
            # boundary with a few-sample phase wobble, so a segment can
            # re-emit a symbol its predecessor already covered.  Drop a
            # segment's leading symbols whose sample position is within
            # nsb/2 of the predecessor's last emission (its last position
            # is unaffected by ITS leading drops, so all seams resolve in
            # parallel).  The dual artifact (a missed symbol in the seam
            # gap) is rare and self-heals downstream — measured in
            # tests/test_segmented_ted.py via the BER harness.
            pos = jnp.where(emits, idxs, np.iinfo(np.int32).max)
            p_first_order = jax.vmap(_shift_left)(pos, starts)
            last_slot = jnp.maximum(counts - 1, 0)
            p_last = jnp.take_along_axis(
                p_first_order, last_slot[:, None], axis=1)[:, 0]
            p_last = jnp.where(counts > 0, p_last, -nshb - 1)  # empty: no-op
            thr = jnp.concatenate(
                [jnp.full((1,), -1, jnp.int32), p_last[:-1] + nshb])
            k_dup = jnp.sum((p_first_order <= thr[:, None])
                            & (jnp.arange(cap_seg)[None, :] < counts[:, None]),
                            axis=1).astype(jnp.int32)
            starts = starts + k_dup
            counts = counts - jnp.minimum(k_dup, counts)

            def pack(a):
                rolled = jax.vmap(_shift_left)(a, starts)   # (S, cap_seg)
                out = jnp.zeros((s_count * cap_seg,), a.dtype)
                off = jnp.concatenate(
                    [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])
                for s in range(s_count):
                    out = jax.lax.dynamic_update_slice(
                        out, rolled[s], (off[s],))
                return out

            data = (CF(pack(data_seg.re), pack(data_seg.im))
                    if output == "symbols" else pack(data_seg))
            count = jnp.sum(counts)
            bitstart, corr = bse[s_count - 1], cre[s_count - 1]

        # consume bitstart samples (reference input_processed, :2068-2070).
        # The new tail is ALWAYS the buffer's last margin samples — a static
        # slice: anything earlier is consumed, or (railed-loop saturation)
        # dropped-oldest, the framework-wide overload policy.  occ clips to
        # margin accordingly; valid tail data is right-aligned at
        # tail[margin-occ:].
        new_occ = jnp.clip(size - bitstart, 0, margin)
        tail2 = CF(xcat.re[n:], xcat.im[n:])
        return (tail2, new_occ, corr), VarOut(data, count)

    return Block("timing_recovery_cc", init, apply, rate_ratio=None)
