"""FIR filtering / integer-ratio resampling — the hot loops (SURVEY.md §2.4).

Reference semantics reproduced:
- ``fir_decimate_cc``    libcsdr.c:528-549 — real-tap FIR at stride D over
  complex input, valid mode: y[k] = sum_t x[k*D+t] * taps[t].
- ``fir_interpolate_cc`` libcsdr.c:579-604 — polyphase zero-stuffed FIR,
  including the reference's tistart=(I-ip) tap-phase convention.
- ``rational_resampler_ff`` libcsdr.c:607-662 — I/D polyphase with carried
  ``last_taps_delay`` phase, including its (T-delay)/I tap truncation.
- ``apply_fir_cc`` / ``apply_real_fir_cc`` libcsdr.c:2261-2291.

Complex streams are planar CF pairs (see core/cplx.py).  Streaming Blocks
keep a zero-initialized input tail whose length is taps_length-1 rounded UP
to a multiple of the stride, so block boundaries advance by exactly ``chunk``
samples and every window of the infinite stream is produced once (the
collective-friendly re-statement of the reference CLI's memmove-overlap,
csdr.c:1164-1176).  The first ``ceil((T-1)/D)`` outputs are zero-history
warmup; after dropping them the stream equals the reference's valid-mode
output exactly.

Correlations default to ``precision=HIGHEST`` (fp32-equivalent via bf16
passes on the MXU) so float32 parity with the C reference holds to ~1e-6;
pass ``precision='default'`` for raw-bf16 throughput when ~-40 dBc mantissa
noise is acceptable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from csdr_tpu.core.block import Block
from csdr_tpu.core import cplx
from csdr_tpu.core.cplx import CF

DEFAULT_PRECISION = jax.lax.Precision.HIGHEST


def _round_up(a: int, m: int) -> int:
    return ((a + m - 1) // m) * m


def _corr_valid_strided_real(x2, taps, stride, precision):
    """Valid-mode strided cross-correlation of a (C, N) float32 batch with one
    real tap vector -> (C, K).  Lowered via XLA conv (correlation, no flip)."""
    lhs = x2[:, None, :]                       # (C, 1, N)
    rhs = taps[None, None, :]                  # (1, 1, T)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(stride,), padding="VALID",
        precision=precision, preferred_element_type=jnp.float32)
    return out[:, 0, :]


def fir_decimate_cc(x: CF, taps, decimation: int, precision=DEFAULT_PRECISION) -> CF:
    """Stateless valid-mode decimating FIR (reference libcsdr.c:528-549).

    x: CF (N,);  taps: float32 (T,);  returns CF (floor((N-T)/D)+1,).
    """
    taps = jnp.asarray(taps, jnp.float32)
    out = _corr_valid_strided_real(jnp.stack([x.re, x.im]), taps, decimation, precision)
    return CF(out[0], out[1])


def fir_decimate_ff(x, taps, decimation: int, precision=DEFAULT_PRECISION):
    out = _corr_valid_strided_real(x[None, :], jnp.asarray(taps, jnp.float32),
                                   decimation, precision)
    return out[0]


def _zerocat_body_kout(n: int, d: int, t: int, precision,
                       allow_vmem: bool = True):
    """Body dispatch plan for the zero-concat split: returns
    ``(kb, kind, jb)`` where kb is the largest body output count (a
    multiple of the dispatched kernel's output tile) such that the body
    kernel runs on the chunk AS IS — every taps window sits inside x and
    no internal input zero-pad concat triggers (each such concat is a full
    HBM round-trip of the ~19 MB chunk — 2x the kernel's own time at the
    WFM shape, the r5 composed-loss lesson, docs/ROUND5.md §2).
    kb == 0 means the split is not worthwhile (tail-concat fallback).

    kind "vmem": the VMEM-slab kernel, which needs (kb/128 + 8) * 128*d
    input samples (8-row halo block) — taken at long taps (>= vmem_min_t)
    and ALSO at short taps when d >= 32: the body has no neighboring
    producer to fuse with (its input is the raw chunk), and at deep
    decimation the XLA Toeplitz slab materialization dominates (on-chip
    A/B at d=50/t=81: vmem 47.0 vs Toeplitz 65.4 us in the NFM chain;
    at d=10/t=81 it is a wash, 62.7 vs 64.3 standalone, so the gate keeps
    Toeplitz there).
    kind "toeplitz": fir_decimate_best's XLA path, whose shifted reshapes
    need (ceil(slab_len/rd) - 1 + kb/128) * rd input samples.
    """
    from csdr_tpu.kernels import fir_pallas

    rd = 128 * d
    if n < 2 * rd:
        return 0, "toeplitz", 0
    fit = (n - t) // d + 1 if n >= t else 0
    prec_ok = precision in (jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGH)
    vmem = (allow_vmem and prec_ok and t <= 129 * d
            and (t >= fir_pallas.vmem_min_t() or d >= 32)
            and rd <= 16384 and fir_pallas._vmem_jb_cap(d, t) >= 8)
    if vmem:
        kb = min(fit, max(0, n // rd - 8) * 128)
        for _ in range(4):                    # jb depends on kb: fixpoint
            if kb < 1024:                     # below the vmem dispatch gate
                kb = 0
                break
            jb = fir_pallas._default_jb(d, t, kb)
            kb2 = kb // (jb * 128) * (jb * 128)
            if kb2 == kb:
                return kb, "vmem", jb
            kb = kb2
        if kb >= 1024:
            return kb, "vmem", fir_pallas._default_jb(d, t, kb)
    slab_len = 127 * d + t
    cs = -(-slab_len // rd)
    kb = min(fit, max(0, n // rd - (cs - 1)) * 128) // 128 * 128
    return (kb if kb >= 1024 else 0), "toeplitz", 0


def fir_decimate_block(taps, decimation: int, name: str = "fir_decimate_cc",
                       precision=DEFAULT_PRECISION, use_pallas: bool = True,
                       force_zerocat: bool | None = None) -> Block:
    """Streaming decimating FIR Block (CF in, CF out).

    State: zero-init tail of length round_up(T-1, D).  Output per chunk of N
    (N % D == 0): exactly N/D samples.  warmup_out = ceil((T-1)/D).

    On TPU the tail-concat (``concat([tail, x])``) is itself a full HBM
    round-trip of the chunk, so when the chunk is deep enough the block
    takes the ZERO-CONCAT split instead (same structure as
    shifted_fir_decimate_block, docs/ROUND5.md §2): the kernel runs on x AS
    IS for every output whose taps window sits inside x; the few head
    outputs needing tail history and the tail-end remainder run as tiny
    FIRs, and only the SMALL output arrays are concatenated.
    force_zerocat: None = auto (TPU/interpret, deep chunk); True/False for
    A/B and tests.
    """
    taps = np.asarray(taps, np.float32)
    t = len(taps)
    d = decimation
    tail_len = _round_up(t - 1, d)
    warmup = tail_len // d
    h0 = tail_len // d                         # outputs needing tail history

    taps_j = jnp.asarray(taps)

    def init():
        return CF.zeros((tail_len,))

    def _small_fir(xin, cnt):
        """cnt outputs from a small input slice (valid-mode)."""
        if jax.default_backend() == "tpu":
            # tiny Toeplitz matmul — the XLA conv is dispatch-bound (tens
            # of us) on this backend even at ~100 samples
            from csdr_tpu.kernels.fir_pallas import fir_decimate_best
            return fir_decimate_best(xin, taps_j, d, cnt, precision)
        return fir_decimate_cc(xin, taps_j, d, precision)[:cnt]

    def apply(tail, x):
        n = x.shape[0]
        assert n % d == 0, f"chunk size {n} must be a multiple of decimation {d}"
        kout = n // d
        from csdr_tpu.kernels.fft_pallas import interpret_mode
        from csdr_tpu.kernels.fir_pallas import fir_decimate_best
        pallas_ok = use_pallas and (jax.default_backend() == "tpu"
                                    or interpret_mode())
        zc = pallas_ok
        if force_zerocat is not None:
            zc = force_zerocat
        kb, kind, jb = (_zerocat_body_kout(n, d, t, precision,
                                           allow_vmem=pallas_ok)
                        if zc else (0, "toeplitz", 0))
        if zc and kb and n >= tail_len and h0 + kb <= kout:
            # body: output k (>= h0) uses xcat[k*d : k*d+t) = x[(k-h0)*d : ...)
            if kind == "vmem":
                from csdr_tpu.kernels.fir_pallas import fir_decimate_vmem
                y_body = fir_decimate_vmem(x, taps_j, d, kb, precision, jb=jb)
            elif use_pallas:
                y_body = fir_decimate_best(x, taps_j, d, kb, precision)
            else:
                y_body = fir_decimate_cc(x, taps_j, d, precision)[:kb]
            parts = []
            if h0 > 0:
                head_need = (h0 - 1) * d + t
                head_in = (tail[:head_need] if head_need <= tail_len
                           else cplx.concat([tail, x[:head_need - tail_len]]))
                parts.append(_small_fir(head_in, h0))
            parts.append(y_body)
            k0 = h0 + kb
            cnt = kout - k0
            if cnt > 0:
                start = k0 * d - tail_len
                span = (cnt - 1) * d + t
                parts.append(_small_fir(x[start: start + span], cnt))
            return x[n - tail_len:] if tail_len else tail, cplx.concat(parts)
        xcat = cplx.concat([tail, x])
        if use_pallas:
            y = fir_decimate_best(xcat, taps_j, d, kout, precision)
        else:
            y = fir_decimate_cc(xcat, taps_j, d, precision)[:kout]
        return xcat[n:], y

    return Block(name=name, init=init, apply=apply, warmup_out=warmup,
                 rate_ratio=1.0 / d)


def shifted_fir_decimate_block(rate: float, taps, decimation: int,
                               name: str = "shift_fir_decimate_cc",
                               precision=DEFAULT_PRECISION,
                               force_fused: bool | None = None) -> Block:
    """NCO shift + decimating FIR as ONE stream block (VERDICT r4 #1) —
    semantically identical to shift_block(rate) | fir_decimate_block(taps,
    D) but on TPU the pair runs as a single VMEM kernel pass over x
    (kernels/fir_pallas.fir_decimate_vmem_shift; the standalone shift was
    a pure HBM round-trip feeding the FIR's own input load — 66.5 us of
    the WFM-advanced 96 us e2e, r4 stage profile).  Reference fuses the
    same pair in libcsdr_gpl.c:126-160 and the NEON hot loops
    libcsdr.c:352-389 + 472-524.

    State: (phase_cycles f32, raw-sample tail CF).  The phase tracks
    xcat[0]'s absolute stream phase so the re-shifted tail is bit-stable
    across chunk boundaries; stream sample 0 starts at phase 0 exactly
    like the serial chain.

    force_fused: None = auto (fused on TPU when the VMEM kernel's shape
    constraints hold); False = always the serial shift+FIR composition
    (the A/B reference)."""
    from csdr_tpu.kernels import fir_pallas
    from csdr_tpu.ops import shift as shift_ops

    taps_np = np.asarray(taps, np.float32)
    t = len(taps_np)
    d = decimation
    tail_len = _round_up(t - 1, d)
    warmup = tail_len // d
    taps_j = jnp.asarray(taps_np)
    # phase of xcat[0] so that stream sample 0 (at xcat[tail_len]) is 0
    theta0 = float(np.mod(-np.float64(rate) * tail_len, 1.0))

    def init():
        return jnp.float32(theta0), CF.zeros((tail_len,))

    def _th(theta, off: int):
        """theta + frac(rate*off), off static — phase at xcat[off]."""
        return jnp.mod(theta + np.float32(np.mod(np.float64(rate) * off,
                                                 1.0)), 1.0)

    def apply(state, x):
        theta, tail = state
        n = x.shape[0]
        assert n % d == 0, f"chunk size {n} must be a multiple of decimation {d}"
        kout = n // d
        rd = 128 * d
        from csdr_tpu.kernels.fft_pallas import interpret_mode
        fused = jax.default_backend() == "tpu" or interpret_mode()
        fused = fused and (t <= 129 * d and 128 * d <= 16384
                           and kout >= 1024
                           and fir_pallas._vmem_jb_cap(d, t) >= 8
                           and precision in (jax.lax.Precision.HIGHEST,
                                             jax.lax.Precision.HIGH))
        if force_fused is not None:
            fused = force_fused
        rows = n // rd if n % rd == 0 else 0
        jb = fir_pallas._default_jb(d, t, kout) if fused else 0
        g = (rows - 8) // jb if (fused and rows) else 0
        if fused and g >= 1:
            # ZERO-CONCAT path (the composed win — r5 A/B: the tail- and
            # pad-concats cost a full HBM round-trip of x each, 2x the
            # kernel's own time at the WFM shape).  The kernel runs on x
            # AS IS: grid g covers outputs whose windows sit inside x;
            # the few edge outputs run as tiny XLA FIRs and only the
            # SMALL output arrays are concatenated.
            k_big = g * jb * 128
            # kernel output k uses x[k*d : k*d+T) = xcat outputs k + h0
            h0 = tail_len // d
            y_big = fir_pallas.fir_decimate_vmem_shift(
                x, taps_j, d, k_big, rate, _th(theta, tail_len), precision,
                jb=jb)
            # head: outputs [0, h0) — the only ones needing tail history
            head_in = cplx.concat([tail, x[: (h0 - 1) * d + t - tail_len]])
            sh_h, _ = shift_ops.shift_cc(head_in, rate,
                                         phase=2.0 * np.pi * theta)
            if jax.default_backend() == "tpu":
                # a tiny Toeplitz matmul — the XLA conv is dispatch-bound
                # (tens of us) on this backend even at 151 samples
                y_head = fir_pallas.fir_decimate_best(sh_h, taps_j, d, h0,
                                                      precision)
            else:
                y_head = fir_decimate_cc(sh_h, taps_j, d, precision)[:h0]
            # tail end: outputs [h0 + k_big, kout) from a small x slice
            k0 = h0 + k_big
            cnt = kout - k0
            parts = [y_head, y_big]
            if cnt > 0:
                start = k0 * d - tail_len
                span = (cnt - 1) * d + t
                xt = x[start: start + span]
                sh_t, _ = shift_ops.shift_cc(
                    xt, rate, phase=2.0 * np.pi * _th(theta, k0 * d))
                if jax.default_backend() == "tpu":
                    y_tail = fir_pallas.fir_decimate_best(
                        sh_t, taps_j, d, cnt, precision)
                else:
                    y_tail = fir_decimate_cc(sh_t, taps_j, d,
                                             precision)[:cnt]
                parts.append(y_tail)
            y = cplx.concat(parts)
            new_tail = x[n - tail_len:]
        else:
            xcat = cplx.concat([tail, x])
            if fused:
                y = fir_pallas.fir_decimate_vmem_shift(
                    xcat, taps_j, d, kout, rate, theta, precision)
            else:
                sh, _ = shift_ops.shift_cc(xcat, rate,
                                           phase=2.0 * np.pi * theta)
                if jax.default_backend() == "tpu":
                    y = fir_pallas.fir_decimate_best(sh, taps_j, d, kout,
                                                     precision)
                else:
                    y = fir_decimate_cc(sh, taps_j, d, precision)[:kout]
            new_tail = xcat[n:]
        theta_next = _th(theta, n)
        return (theta_next, new_tail), y

    return Block(name=name, init=init, apply=apply, warmup_out=warmup,
                 rate_ratio=1.0 / d)


def _interp_tap_matrix(taps: np.ndarray, interpolation: int) -> np.ndarray:
    """Hmat[s, ip] = taps[(I-ip) + s*I] (0 where out of range) so that
    y[i*I+ip] = sum_s x[i+s] * Hmat[s, ip] — the reference's tap-phase rule
    fir_interpolate_cc (libcsdr.c:579-604) including its tistart=(I-ip)
    convention."""
    t = len(taps)
    i_ = interpolation
    s_max = (t - 1) // i_ + 1
    h = np.zeros((s_max, i_), np.float32)
    for ip in range(i_):
        ti = i_ - ip
        s = 0
        while ti < t:
            h[s, ip] = taps[ti]
            ti += i_
            s += 1
    return h


def _frames(x, k: int, s: int):
    """Overlapping frames F[i, j] = x[i + j], shape (k, s), built from s
    static shifted slices (a (k, s) gather is pathologically slow on TPU)."""
    return jnp.stack([jax.lax.slice_in_dim(x, j, j + k) for j in range(s)],
                     axis=1)


def fir_interpolate_cc(x: CF, taps, interpolation: int,
                       precision=DEFAULT_PRECISION) -> CF:
    """Stateless polyphase interpolator (reference libcsdr.c:579-604).

    Returns CF of length (N - S + 1) * I where S = frames length.
    Implemented as frames(N-S+1, S) @ Hmat(S, I) — a real MXU matmul per
    plane.
    """
    h = jnp.asarray(_interp_tap_matrix(np.asarray(taps, np.float32), interpolation))
    s = h.shape[0]
    k = x.shape[0] - s + 1
    yr = jnp.dot(_frames(x.re, k, s), h, precision=precision,
                 preferred_element_type=jnp.float32)
    yi = jnp.dot(_frames(x.im, k, s), h, precision=precision,
                 preferred_element_type=jnp.float32)
    return CF(yr.reshape(-1), yi.reshape(-1))


def fir_interpolate_block(taps, interpolation: int,
                          name: str = "fir_interpolate_cc",
                          precision=DEFAULT_PRECISION) -> Block:
    """Streaming interpolator: tail = S-1 input samples; N in -> N*I out."""
    h_np = _interp_tap_matrix(np.asarray(taps, np.float32), interpolation)
    s = h_np.shape[0]
    h = jnp.asarray(h_np)

    def init():
        return CF.zeros((s - 1,))

    def apply(tail, x):
        n = x.shape[0]
        xcat = cplx.concat([tail, x])
        yr = jnp.dot(_frames(xcat.re, n, s), h, precision=precision,
                     preferred_element_type=jnp.float32)
        yi = jnp.dot(_frames(xcat.im, n, s), h, precision=precision,
                     preferred_element_type=jnp.float32)
        return xcat[n:], CF(yr.reshape(-1), yi.reshape(-1))

    return Block(name=name, init=init, apply=apply,
                 warmup_out=(s - 1) * interpolation,
                 rate_ratio=float(interpolation))


def plain_interpolate_cc(x: CF, interpolation: int) -> CF:
    """Zero-stuffing only (reference libcsdr.c:2499-2506)."""
    n = x.shape[0]
    yr = jnp.zeros((n, interpolation), jnp.float32).at[:, 0].set(x.re)
    yi = jnp.zeros((n, interpolation), jnp.float32).at[:, 0].set(x.im)
    return CF(yr.reshape(-1), yi.reshape(-1))


def _stride1_slabs(x, slab_len: int, jn: int, r: int = 128):
    """Toeplitz slab rows for a stride-1 tile-R FIR: S[j, :] =
    x[j*r : j*r + slab_len], built from static shifted reshapes (layout ops
    only, no gather).  Same construction as the decimating Toeplitz kernel
    (kernels/fir_pallas._fir_decimate_toeplitz) at D=1."""
    n_slices = -(-slab_len // r)
    need = (n_slices - 1 + jn) * r
    if x.shape[0] < need:
        x = jnp.concatenate([x, jnp.zeros((need - x.shape[0],), x.dtype)])
    cols = []
    for c in range(n_slices):
        width = min(r, slab_len - c * r)
        seg = (jax.lax.dynamic_slice(x, (c * r,), (jn * r,)) if c
               else x[: jn * r])
        cols.append(seg.reshape(jn, r)[:, :width])
    return jnp.concatenate(cols, axis=1)          # (jn, slab_len)


def _stride1_toeplitz_w(taps_np: np.ndarray, r: int = 128):
    from csdr_tpu.kernels.fir_pallas import _toeplitz_w
    return _toeplitz_w(np.asarray(taps_np, np.float32), 1, r)


def _use_stride1_toeplitz(taps_leaves, t: int, k: int) -> bool:
    """The frames-stack form materializes a (K, T) slab — T HBM passes over
    the stream — feeding an N=1 matvec; the Toeplitz tile form reads the
    stream ~slab_len/128 times into one proper (K/128, slab_len) @ 128-lane
    MXU matmul (measured 80.8 -> ~3 us on the 53-tap WFM de-emphasis at
    48k samples).  Needs concrete taps (the W matrix is host-built)."""
    return (t >= 16 and k >= 128
            and not any(isinstance(l, jax.core.Tracer) for l in taps_leaves))


def apply_fir_cc(x: CF, taps: CF, precision=DEFAULT_PRECISION) -> CF:
    """Valid-mode FIR with COMPLEX taps on complex input
    (reference libcsdr.c:2261-2273): y[i] = sum_t x[i+t]*taps[t]
    (complex multiply, no conjugate).  Toeplitz tile matmul for long
    concrete taps, else frames @ taps — a stride-1 XLA conv lowers
    pathologically on this TPU backend."""
    t = taps.shape[0]
    k = x.shape[0] - t + 1
    dot = lambda a, b: jnp.dot(a, b, precision=precision,
                               preferred_element_type=jnp.float32)
    if _use_stride1_toeplitz((taps.re, taps.im), t, k):
        wr = jnp.asarray(_stride1_toeplitz_w(np.asarray(taps.re)))
        wi = jnp.asarray(_stride1_toeplitz_w(np.asarray(taps.im)))
        jn = -(-k // 128)
        sr = _stride1_slabs(x.re, wr.shape[0], jn)
        si = _stride1_slabs(x.im, wr.shape[0], jn)
        yr = (dot(sr, wr) - dot(si, wi)).reshape(-1)[:k]
        yi = (dot(sr, wi) + dot(si, wr)).reshape(-1)[:k]
        return CF(yr, yi)
    fr = _frames(x.re, k, t)
    fi = _frames(x.im, k, t)
    return CF(dot(fr, taps.re) - dot(fi, taps.im),
              dot(fr, taps.im) + dot(fi, taps.re))


def apply_real_fir_cc(x: CF, taps, precision=DEFAULT_PRECISION) -> CF:
    """Valid-mode real-tap FIR on complex input (reference libcsdr.c:2276-2291).
    Toeplitz tile matmul / frames @ taps (see apply_fir_cc)."""
    taps = jnp.asarray(taps, jnp.float32)
    t = taps.shape[0]
    k = x.shape[0] - t + 1
    if k <= 0:
        return fir_decimate_cc(x, taps, 1, precision)
    if _use_stride1_toeplitz((taps,), t, k):
        w = jnp.asarray(_stride1_toeplitz_w(np.asarray(taps)))
        jn = -(-k // 128)
        dot = lambda s: jnp.dot(s, w, precision=precision,
                                preferred_element_type=jnp.float32)
        return CF(dot(_stride1_slabs(x.re, w.shape[0], jn)).reshape(-1)[:k],
                  dot(_stride1_slabs(x.im, w.shape[0], jn)).reshape(-1)[:k])
    dot = lambda a: jnp.dot(_frames(a, k, t), taps, precision=precision,
                            preferred_element_type=jnp.float32)
    return CF(dot(x.re), dot(x.im))


def apply_real_fir_ff(x, taps, precision=DEFAULT_PRECISION):
    """Valid-mode real FIR: Toeplitz tile matmul for long concrete taps,
    else frames @ taps — a stride-1 XLA conv lowers ~1000x slower on this
    TPU backend, and the frames stack itself costs T passes over the
    stream (see _use_stride1_toeplitz)."""
    taps = jnp.asarray(taps, jnp.float32)
    t = taps.shape[0]
    k = x.shape[0] - t + 1
    if k <= 0:
        return fir_decimate_ff(x, taps, 1, precision)
    x = jnp.asarray(x, jnp.float32)
    if _use_stride1_toeplitz((taps,), t, k):
        w = jnp.asarray(_stride1_toeplitz_w(np.asarray(taps)))
        jn = -(-k // 128)
        slabs = _stride1_slabs(x, w.shape[0], jn)
        return jnp.dot(slabs, w, precision=precision,
                       preferred_element_type=jnp.float32).reshape(-1)[:k]
    return jnp.dot(_frames(x, k, t), taps,
                   precision=precision, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# rational resampler (I/D polyphase with carried tap phase) — real streams
# ---------------------------------------------------------------------------

def _resampler_phase_matrix(taps_np: np.ndarray, i_: int) -> np.ndarray:
    """P[p, j] = taps[p + j*I], masked by the reference's truncation: the
    inner loop runs exactly (T - delayi)/I terms (libcsdr.c:626-630), so
    taps with j >= (T-p)//I are DROPPED even when p + j*I < T."""
    t = len(taps_np)
    s = (t - 1) // i_ + 1
    pmat = np.zeros((i_, s), np.float32)
    j = np.arange(s)
    for p in range(i_):
        ok = j < (t - p) // i_
        pmat[p, ok] = taps_np[(p + j * i_)[ok]]
    return pmat


def rational_resampler_ff(x, taps, interpolation: int, decimation: int,
                          last_taps_delay=0, precision=DEFAULT_PRECISION):
    """Reference libcsdr.c:607-662 semantics; returns (y, count,
    input_processed, next_taps_delay).  y has capacity N*I//D; entries past
    count are zero.

    For each output oi:
      startingi = (oi*D + I - 1 - ltd) // I
      delayi    = (ltd + startingi*I - oi*D) % I
      y[oi]     = I * sum_j x[startingi+j] * taps[delayi + j*I]
    stopping when startingi + T//I + 1 > N.
    """
    taps = jnp.asarray(taps, jnp.float32)
    t = taps.shape[0]
    i_, d_ = interpolation, decimation
    n = x.shape[0]
    cap = n * i_ // d_
    oi = jnp.arange(cap, dtype=jnp.int32)
    ltd = jnp.asarray(last_taps_delay, jnp.int32)
    startingi = (oi * d_ + i_ - 1 - ltd) // i_
    delayi = (ltd + startingi * i_ - oi * d_) % i_
    valid = startingi + t // i_ + 1 <= n
    pmat = _resampler_phase_matrix(np.asarray(taps), i_)
    s = pmat.shape[1]
    gidx = startingi[:, None] + jnp.arange(s)[None, :]
    gidx_c = jnp.clip(gidx, 0, n - 1)
    frames = jnp.where(gidx < n, x[gidx_c], 0.0)
    ph = jnp.asarray(pmat)[delayi]               # (cap, S)
    y = jnp.sum(frames * ph, axis=1, dtype=jnp.float32) * i_
    y = jnp.where(valid, y, 0.0)
    count = jnp.sum(valid.astype(jnp.int32))
    # The reference exits its loop with startingi/delayi already computed for
    # the first *invalid* output index (libcsdr.c:631-635) — mirror that.
    input_processed = (count * d_ + i_ - 1 - ltd) // i_
    next_delay = (ltd + input_processed * i_ - count * d_) % i_
    return y, count, input_processed, next_delay


def rational_resampler_block(taps, interpolation: int, decimation: int,
                             name: str = "rational_resampler_ff",
                             precision=DEFAULT_PRECISION) -> Block:
    """Streaming rational resampler with exact-rate static shapes.

    In global stream coordinates the reference's carried ``last_taps_delay``
    bookkeeping (libcsdr.c:607-662) collapses to closed-form per-output
    indices:  S(m) = floor((m*D + I - 1)/I),  delay(m) = (S(m)*I - m*D) mod I,
    and because Nout*D = N*I per chunk, S/delay are chunk-periodic:
    S(c*Nout + k) = c*N + S(k).  So the only state is a zero-init input tail;
    outputs are anchored ``shift_out = ceil(S_frames*I/D)`` samples late so
    every frame fits in [tail | chunk], giving exactly N*I/D outputs per chunk
    of N.  warmup_out = shift_out.
    """
    taps_np = np.asarray(taps, np.float32)
    t = len(taps_np)
    i_, d_ = interpolation, decimation
    s = (t - 1) // i_ + 1                      # frame length
    shift_out = -(-s * i_ // d_)               # output delay (samples)
    pmat_np = _resampler_phase_matrix(taps_np, i_)

    def _S(m):
        return (m * d_ + i_ - 1) // i_

    def _delay(m):
        return (_S(m) * i_ - m * d_) % i_

    cache = {}

    def make_plan(n: int):
        """Per-chunk host plan.  The per-output window start/tap-phase are
        OUTPUT-PERIODIC with period I (S(m+I) = S(m)+D, delay(m+I) =
        delay(m)), so the whole resampler decomposes into I stride-D
        convolutions — a (cap, S) gather here is ~100x slower on TPU."""
        nout = n * i_ // d_
        assert nout * d_ == n * i_, "chunk*I must be divisible by D"
        k = np.arange(nout)
        m = k - shift_out
        start_rel = _S(m)
        tail_len = int(max(s + 1, -start_rel.min() + 1))
        xidx = start_rel + tail_len
        assert xidx.min() >= 0 and xidx.max() + s - 1 < tail_len + n
        kmax = -(-nout // i_)
        starts = xidx[:i_]                               # (I,)
        taps_sel = pmat_np[_delay(m[:i_]).astype(np.int64)]  # (I, S)
        lw = (kmax - 1) * d_ + s
        pad = max(0, int(starts.max()) + lw - (tail_len + n))
        return tail_len, starts, taps_sel, kmax, lw, pad, nout

    def init():
        return None  # tail allocated lazily (length depends on chunk size)

    def apply(tail, x):
        n = x.shape[0]
        if n not in cache:
            cache[n] = make_plan(n)
        tail_len, starts, taps_sel, kmax, lw, pad, nout = cache[n]
        if tail is None:
            tail = jnp.zeros((tail_len,), jnp.float32)
        xcat = jnp.concatenate([tail, x, jnp.zeros((pad,), jnp.float32)])
        segs = jnp.stack([xcat[int(st):int(st) + lw] for st in starts])
        # grouped conv: I output phases, each its own taps, stride D
        out = jax.lax.conv_general_dilated(
            segs[None, :, :], jnp.asarray(taps_sel)[:, None, :],
            window_strides=(d_,), padding="VALID", feature_group_count=i_,
            precision=precision,
            preferred_element_type=jnp.float32)[0]       # (I, kmax)
        y = (out.T.reshape(-1)[:nout] * i_).astype(jnp.float32)
        return xcat[n:n + tail_len] if pad else xcat[n:], y

    return Block(name=name, init=init, apply=apply, warmup_out=shift_out,
                 rate_ratio=i_ / d_)


# ---------------------------------------------------------------------------
# complex-tap FIR applications: peak filters & pulse shaping
# ---------------------------------------------------------------------------

def apply_fir_cc_block(taps, name: str = "apply_fir_cc",
                       precision=DEFAULT_PRECISION) -> Block:
    """Streaming valid-mode complex-tap FIR (CF taps), tail-carried.
    Used by peaks_fir_cc (reference csdr.c:2975-3016) and bfsk front ends."""
    taps_cf = taps if isinstance(taps, CF) else CF(
        jnp.asarray(np.real(taps), jnp.float32),
        jnp.asarray(np.imag(taps), jnp.float32))
    t = taps_cf.shape[0]

    def init():
        return CF.zeros((t - 1,))

    def apply(tail, x):
        xcat = cplx.concat([tail, x])
        y = apply_fir_cc(xcat, taps_cf, precision)[: x.shape[0]]
        return xcat[x.shape[0]:], y

    return Block(name, init, apply, warmup_out=t - 1)


def peaks_fir_cc_block(peak_rates, length: int,
                       precision=DEFAULT_PRECISION) -> Block:
    """Multi-peak filter for FSK tones (reference peaks_fir_cc CLI,
    csdr.c:2975-3016 + firdes_add_peak_c libcsdr.c:2232-2272)."""
    from csdr_tpu import firdes
    taps = firdes.firdes_add_peak_c(length, peak_rates)
    return apply_fir_cc_block(taps, name="peaks_fir_cc", precision=precision)


def pulse_shaping_filter_cc_block(matched_filter: str, samples_per_symbol: int,
                                  num_taps: int | None = None, beta: float = 0.25,
                                  precision=DEFAULT_PRECISION) -> Block:
    """RRC / COSINE matched filter on complex symbols
    (reference csdr.c:3206-3218 + firdes_rrc_f/firdes_cosine_f)."""
    from csdr_tpu import firdes
    if matched_filter.upper() == "RRC":
        taps = firdes.firdes_rrc_f(num_taps, samples_per_symbol, beta)
    else:
        taps = firdes.firdes_cosine_f(2 * samples_per_symbol + 1, samples_per_symbol)
    taps_j = jnp.asarray(taps)
    t = len(taps)

    def init():
        return CF.zeros((t - 1,))

    def apply(tail, x):
        xcat = cplx.concat([tail, x])
        y = apply_real_fir_cc(xcat, taps_j, precision)[: x.shape[0]]
        return xcat[x.shape[0]:], y

    return Block("pulse_shaping_filter_cc", init, apply, warmup_out=t - 1)
