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


def fractional_decimator_block(rate: float, num_poly_points: int = 12,
                               taps=None, chunk_size: int | None = None,
                               out_capacity: int | None = None) -> Block:
    """Streaming fractional decimator.  Emits VarOut (capacity ~= N/rate + 2).

    taps: optional prefilter FIR (reference applies fir_one_pass_ff at each
    interpolation point, libcsdr.c:769-772 — equivalently a valid-mode FIR of
    the buffer followed by the polynomial interpolator on the filtered stream).
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

    def init():
        return None  # lazily sized on first chunk

    def _mk_state(n):
        buf = jnp.zeros((margin + n,), jnp.float32)
        return (buf, jnp.int32(0), jnp.float32(-xifirst))

    def apply(state, x):
        n = x.shape[0]
        cap = out_capacity or int(n / rate) + 2
        if state is None:
            state = _mk_state(n)
        buf, occ, where = state
        buf = jax.lax.dynamic_update_slice(buf, x.astype(jnp.float32), (occ,))
        size = occ + n
        # prefiltered stream: pre[i] = sum_t taps[t]*buf[i+t]
        if taps_j is None:
            pre = buf
        else:
            from csdr_tpu.ops.fir import apply_real_fir_ff
            pre = apply_real_fir_ff(buf, taps_j)
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
            r_int = int(rate)
            s0 = jnp.ceil(where).astype(jnp.int32) - xifirst
            pre_pad = jnp.concatenate(
                [pre, jnp.zeros((cap * r_int,), pre.dtype)])
            base = jax.lax.dynamic_slice(pre_pad, (s0,), (cap * r_int,))
            # subsample as reshape @ one-hot: plain strided slices lower
            # ~5x slower than this degenerate matmul on this backend
            e0 = jnp.zeros((r_int,), jnp.float32).at[0].set(1.0)
            y = jnp.dot(base.reshape(cap, r_int), e0,
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
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
            gidx = jnp.clip(fd_low[:, None] + jnp.arange(p)[None, :], 0,
                            pre.shape[0] - 1)
            y = jnp.sum(coeffs * pre[gidx], axis=1).astype(jnp.float32)
        y = jnp.where(valid, y, 0.0)
        count = jnp.sum(valid.astype(jnp.int32))
        # loop-exit carry (reference libcsdr.c:789-792): input_processed is
        # computed from the first invalid index_high
        ih_exit = jnp.ceil(where + count.astype(jnp.float32) * jnp.float32(rate)).astype(jnp.int32)
        input_processed = (ih_exit - 1) + xifirst
        new_where = where + count.astype(jnp.float32) * jnp.float32(rate) - input_processed.astype(jnp.float32)
        new_occ = size - input_processed
        # roll consumed samples out of the buffer
        buf = jax.lax.dynamic_slice(
            jnp.concatenate([buf, jnp.zeros_like(buf)]), (input_processed,), (buf.shape[0],))
        return (buf, new_occ, new_where), VarOut(y, count)

    return Block("fractional_decimator_ff", init, apply)


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
