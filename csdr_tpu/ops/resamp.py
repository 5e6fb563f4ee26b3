"""Fractional (floating-rate) decimation via Lagrange polynomial interpolation
(reference fractional_decimator_ff, libcsdr.c:715-793; SURVEY.md §2.4).

Variable-rate semantics under static shapes: each apply() appends the chunk to
a fixed-capacity carry buffer, emits a fixed-capacity VarOut whose valid count
is the number of outputs the reference would have produced, and rolls the
buffer by the consumed amount — the reference's ``input_processed``/``where``
carry (libcsdr.h:151-170) as a pytree.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from csdr_tpu.core.block import Block, VarOut


def _lagrange_denominators(num_poly_points: int) -> np.ndarray:
    """poly_precalc_denomiator (reference libcsdr.c:726-739)."""
    p = num_poly_points & ~1
    xifirst = -(p // 2) + 1
    xilast = p // 2
    xs = np.arange(xifirst, xilast + 1, dtype=np.float64)
    den = np.ones(p, dtype=np.float64)
    for i, xi in enumerate(xs):
        for xj in xs:
            if xi != xj:
                den[i] *= (xi - xj)
    return den.astype(np.float32)


def _rational_den(rate: float, max_den: int = 64) -> int | None:
    """Smallest q <= max_den with rate*q integral (f64), else None."""
    for q in range(1, max_den + 1):
        if abs(rate * q - round(rate * q)) < 1e-9 * max(1.0, abs(rate * q)):
            return q
    return None


def fractional_decimator_block(rate: float, num_poly_points: int = 12,
                               taps=None, chunk_size: int | None = None,
                               out_capacity: int | None = None,
                               rational: bool | None = None) -> Block:
    """Streaming fractional decimator.  Emits VarOut (capacity ~= N/rate + 2).

    taps: optional prefilter FIR (reference applies fir_one_pass_ff at each
    interpolation point, libcsdr.c:769-772 — equivalently a valid-mode FIR of
    the buffer followed by the polynomial interpolator on the filtered stream).

    rational: for rate = num/den (den <= 64 detected from the f64 rate, e.g.
    CLI '2.4' -> 12/5) the den output phase classes each have FIXED Lagrange
    coefficients, so the whole interpolator collapses to one slab matmul on
    the MXU — no (cap, P) gather (ROADMAP r1 #3; ~100x on TPU).  Emission is
    quantized to multiples of den per chunk to keep the carried `where`
    integral (pure chunking change: the output STREAM is identical, only up
    to den-1 samples shift to the next chunk).  None = auto-detect; False
    forces the generic gather path (the golden reference form).
    """
    assert rate > 1.0, "can't fractionally decimate rate <= 1.0"
    p = num_poly_points & ~1
    xifirst = -(p // 2) + 1
    xilast = p // 2
    xs_np = np.arange(xifirst, xilast + 1, dtype=np.float32)
    den = jnp.asarray(_lagrange_denominators(p))
    taps_j = None if taps is None else jnp.asarray(taps, jnp.float32)
    t_len = 0 if taps is None else int(taps_j.shape[0])
    margin = p + t_len + int(np.ceil(rate)) + 4

    q_den = None
    if rational is not False and not float(rate).is_integer() and p >= 4:
        q_den = _rational_den(rate)
    if q_den is not None:
        return _fractional_decimator_rational_block(
            rate, q_den, p, xifirst, xs_np, taps_j, t_len, margin,
            out_capacity)

    # Fixed-size carried tail instead of an (margin + n) ring buffer: the
    # stream's last `margin` samples always live in xcat[n : n + margin]
    # (a STATIC slice), and the unconsumed region starts at the traced
    # offset base = margin - occ.  The r2 form needed FOUR traced-start
    # passes over ~chunk-size buffers per call (dynamic_update_slice fill,
    # pad concat, read slice, consume roll) — ~50 us at 240k samples on
    # axon; this form needs ONE traced-start read.
    def init():
        return (jnp.zeros((margin,), jnp.float32), jnp.int32(0),
                jnp.float32(-xifirst))

    def apply(state, x):
        n = x.shape[0]
        cap = out_capacity or int(n / rate) + 2
        tail, occ, where = state
        base = margin - occ                       # traced stream offset
        size = occ + n
        # static pad so every traced-start read below stays in bounds
        # (dynamic_slice CLAMPS out-of-range starts — silently wrong data):
        # reads reach base + s0 + cap_read*ceil(rate) <= margin + (p+4) + that,
        # with cap_read = cap rounded up to the integer path's 128-row tile.
        r_ceil = int(np.ceil(rate))
        cap_read = -(-cap // 128) * 128
        pad_extra = max(16, cap_read * r_ceil - n + p + t_len + r_ceil + 16)
        xcat = jnp.concatenate([tail, x.astype(jnp.float32),
                                jnp.zeros((pad_extra,), jnp.float32)])
        # prefiltered stream: pre[i] = sum_t taps[t]*xcat[i+t]
        if taps_j is None:
            pre = xcat
        else:
            from csdr_tpu.ops.fir import apply_real_fir_ff
            pre = apply_real_fir_ff(xcat, taps_j)
        k = jnp.arange(cap, dtype=jnp.float32)
        wh = where + k * jnp.float32(rate)
        index_high = jnp.ceil(wh).astype(jnp.int32)
        valid = index_high + p + t_len < size
        if float(rate).is_integer():
            # integer rate: wh stays integer (where starts integer and
            # count*rate is integer), so xwhere == 1 and the Lagrange
            # weights are EXACTLY one-hot (integer products in f32) —
            # y[k] = pre[wh[k] - xifirst].  dynamic_slice + static stride
            # replaces the (cap, P) gather, which is pathologically slow
            # on TPU (same fix as ops/shift.decimating_shift_cc).
            # The subsample itself is a (rows, r*128) @ one-hot (r*128, 128)
            # MXU matmul: a (cap, r) reshape would pad its r lanes to the
            # 128-lane tile — a ~25x relayout blowup measured at ~50 us for
            # 240k samples; keeping the lane dim a 128-multiple makes the
            # whole op ~3 passes over the stream.
            r_int = int(rate)
            cap_pad = -(-cap // 128) * 128
            s0 = jnp.ceil(where).astype(jnp.int32) - xifirst + base
            win = jax.lax.dynamic_slice(pre, (s0,), (cap_pad * r_int,))
            e_np = np.zeros((r_int * 128, 128), np.float32)
            e_np[np.arange(128) * r_int, np.arange(128)] = 1.0
            y = jnp.dot(win.reshape(cap_pad // 128, r_int * 128),
                        jnp.asarray(e_np),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
            y = y.reshape(-1)[:cap]
        else:
            fd_low = index_high - 1
            xwhere = wh - fd_low.astype(jnp.float32)
            # Lagrange coefficients: c[:, i] = prod_{j != i} (xwhere - xs[j])
            diff = xwhere[:, None] - jnp.asarray(xs_np)[None, :]    # (cap, P)
            cols = []
            for i in range(p):
                mask = np.ones(p, bool)
                mask[i] = False
                cols.append(jnp.prod(diff[:, mask], axis=1))
            coeffs = jnp.stack(cols, axis=1) / den[None, :]
            gidx = jnp.clip(base + fd_low[:, None] + jnp.arange(p)[None, :],
                            0, pre.shape[0] - 1)
            y = jnp.sum(coeffs * pre[gidx], axis=1).astype(jnp.float32)
        y = jnp.where(valid, y, 0.0)
        count = jnp.sum(valid.astype(jnp.int32))
        # loop-exit carry (reference libcsdr.c:789-792): input_processed is
        # computed from the first invalid index_high
        ih_exit = jnp.ceil(where + count.astype(jnp.float32) * jnp.float32(rate)).astype(jnp.int32)
        # clamp >= 0 (like the rational path): a zero-output chunk at a
        # fresh state otherwise yields input_processed = -1, permanently
        # desyncing occ/where by one phantom buffer slot
        input_processed = jnp.maximum((ih_exit - 1) + xifirst, 0)
        new_where = where + count.astype(jnp.float32) * jnp.float32(rate) - input_processed.astype(jnp.float32)
        new_occ = size - input_processed
        new_tail = jax.lax.slice_in_dim(xcat, n, n + margin)
        return (new_tail, new_occ, new_where), VarOut(y, count)

    return Block("fractional_decimator_ff", init, apply, rate_ratio=None)


def _fractional_decimator_rational_block(rate, q_den, p, xifirst, xs_np,
                                         taps_j, t_len, margin,
                                         out_capacity) -> Block:
    """Rational-rate fractional decimator as ONE slab matmul (no gather).

    For rate = num/den with integral carried `where` (emission quantized to
    multiples of den), output k = j*den + qc has
      wh       = W + j*num + qc*rate
      fd_low   = W + j*num + ceil(qc*rate) - 1
      xwhere   = qc*rate - ceil(qc*rate) + 1          (constant per class!)
    so the den Lagrange coefficient vectors are host constants, and
      y[j*den + qc] = sum_i c_qc[i] * pre[W - 1 + j*num + off_qc + i].
    Grouping G = ceil(128/den) j's per slab row fills the MXU's 128-lane N
    dim:  Y (rows, G*den) = slabs @ Wmat,  slabs row r = pre_shift[r*G*num :
    r*G*num + slab_len],  Wmat[(g*num + off_q + i), g*den + q] = c_q[i].
    Same construction as the FIR Toeplitz kernel (kernels/fir_pallas.py),
    with per-class shifted taps instead of one tap vector.
    """
    num = int(round(rate * q_den))
    # emission is quantized to q_den outputs, so up to (q_den-1)*rate extra
    # input samples stay buffered beyond the generic margin
    margin = margin + int(np.ceil((q_den - 1) * rate)) + 2
    # per-class offsets and Lagrange coefficient vectors (host, f64)
    offs, coefs = [], []
    den_np = np.asarray(_lagrange_denominators(p), np.float64)
    xs64 = xs_np.astype(np.float64)
    for qc in range(q_den):
        whf = qc * num / q_den
        off = int(np.ceil(whf))
        xw = whf - off + 1.0
        c = np.empty(p, np.float64)
        for i in range(p):
            mask = np.ones(p, bool)
            mask[i] = False
            c[i] = np.prod(xw - xs64[mask])
        offs.append(off)
        coefs.append(c / den_np)
    max_off = max(offs)
    g_grp = max(1, -(-128 // q_den))             # j's per slab row
    slab_len = (g_grp - 1) * num + max_off + p
    wmat_np = np.zeros((slab_len, g_grp * q_den), np.float32)
    for g in range(g_grp):
        for qc in range(q_den):
            wmat_np[g * num + offs[qc]: g * num + offs[qc] + p,
                    g * q_den + qc] = coefs[qc]

    # Fixed-size carried tail (see fractional_decimator_block's generic
    # apply): ONE traced-start read per call instead of four traced-start
    # buffer passes.
    def init():
        return (jnp.zeros((margin,), jnp.float32), jnp.int32(0),
                jnp.float32(-xifirst))

    def apply(state, x):
        n = x.shape[0]
        # +q_den headroom: emission floors to whole den-classes, leaving up
        # to q_den-1 outputs buffered; the NEXT chunk must be able to emit
        # arrivals + that backlog or occupancy grows without bound (e.g.
        # rate 2.4, chunk 246: arrivals 102.5/chunk but a +2 cap clamps
        # emission at 100 forever — the buffer then overflows silently)
        cap = out_capacity or int(n / rate) + q_den + 2
        # capacity rounded to whole slab rows of g_grp*q_den outputs
        rows = -(-cap // (g_grp * q_den))
        tail, occ, where = state
        base = margin - occ                       # traced stream offset
        size = occ + n
        # slab source: pre from W-1 onward.  The c-th shifted-reshape slice
        # reads ps[c*rd : c*rd + rows*rd], so ps must span
        # (n_slices-1 + rows)*rd — sizing it short makes the out-of-range
        # dynamic_slice CLAMP its start and fill the tail slab columns with
        # data from the wrong offset; pad xcat so b0 + ps_len always fits.
        rd = g_grp * num
        n_slices = -(-slab_len // rd)
        ps_len = (n_slices - 1 + rows) * rd
        pad_extra = max(16, ps_len - n + p + t_len + 16)
        xcat = jnp.concatenate([tail, x.astype(jnp.float32),
                                jnp.zeros((pad_extra,), jnp.float32)])
        if taps_j is None:
            pre = xcat
        else:
            from csdr_tpu.ops.fir import apply_real_fir_ff
            pre = apply_real_fir_ff(xcat, taps_j)
        w_int = jnp.round(where).astype(jnp.int32)
        b0 = base + jnp.maximum(w_int - 1, 0)
        ps = jax.lax.dynamic_slice(pre, (b0,), (ps_len,))
        cols = []
        for c in range(n_slices):
            width = min(rd, slab_len - c * rd)
            seg = (jax.lax.dynamic_slice(ps, (c * rd,), (rows * rd,))
                   if c else ps[: rows * rd])
            cols.append(seg.reshape(rows, rd)[:, :width])
        slabs = jnp.concatenate(cols, axis=1)           # (rows, slab_len)
        y_mat = jnp.dot(slabs, jnp.asarray(wmat_np),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
        y = y_mat.reshape(-1)[:cap]                      # [j, q] row-major
        # validity: same rule as the generic path, index_high + p + t_len
        # < size; quantized down to a whole number of den-classes
        k = jnp.arange(cap, dtype=jnp.float32)
        wh = where + k * jnp.float32(rate)
        valid = jnp.ceil(wh).astype(jnp.int32) + p + t_len < size
        count_all = jnp.sum(valid.astype(jnp.int32))
        count = (count_all // q_den) * q_den
        y = jnp.where(jnp.arange(cap) < count, y, 0.0)
        # carry: count*rate = (count/den)*num is an exact integer
        cnum = (count // q_den) * num
        ih_exit = w_int + cnum
        input_processed = jnp.maximum((ih_exit - 1) + xifirst, 0)
        new_where = (where + cnum.astype(jnp.float32)
                     - input_processed.astype(jnp.float32))
        new_occ = size - input_processed
        new_tail = jax.lax.slice_in_dim(xcat, n, n + margin)
        return (new_tail, new_occ, new_where), VarOut(y, count)

    return Block("fractional_decimator_ff", init, apply, rate_ratio=None)


def old_fractional_decimator_ff(x, rate: float, taps=None, remain: float = 0.0):
    """Deprecated linear-interpolation fractional decimator
    (reference old_fractional_decimator_ff, libcsdr.c:682-713), provided for
    CLI parity.  One-shot over an array; returns (y, input_processed, remain').
    """
    x = np.asarray(x, np.float32)
    taps_np = None if taps is None else np.asarray(taps, np.float32)
    t = 0 if taps_np is None else len(taps_np)

    def firv(i):
        if taps_np is None:
            return x[i]
        return float(np.dot(taps_np, x[i:i + t]))

    out = []
    where = remain
    n = len(x)
    if where == 0.0:
        out.append(firv(0))
        where += rate
    prev_ih = -1
    result_high = 0.0
    ih = int(np.ceil(where))
    while ih + t < n:
        if prev_ih == ih - 1:
            result_low = result_high
        else:
            result_low = firv(ih - 1)
        result_high = firv(ih)
        frac = where - ih + 1
        out.append(result_low * (1 - frac) + result_high * frac)
        prev_ih = ih
        where += rate
        ih = int(np.ceil(where))
    input_processed = ih - 1
    return (np.asarray(out, np.float32), input_processed,
            where - input_processed)
