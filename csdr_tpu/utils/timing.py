"""Throughput measurement that survives lazy/remote backends (axon tunnel).

``jax.block_until_ready`` does not actually synchronize on the axon TPU
tunnel, so naive timing measures enqueue latency.  The reliable recipe:
run the kernel k times INSIDE one jitted fori_loop (device-side loop, no
host round-trips), reduce each result to a scalar accumulator, fetch the
scalar, and take a difference quotient between two k values to cancel
dispatch/transfer constants.  (The in-loop reduction adds ~|out|/|in| extra
traffic — negligible for decimators.)

This is the framework's `test200.c`/`through` equivalent (SURVEY.md §6).
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp

from csdr_tpu.core.cplx import CF


def _scalarize(y):
    if isinstance(y, CF):
        return jnp.sum(y.re) + jnp.sum(y.im)
    leaves = jax.tree_util.tree_leaves(y)
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)


def time_kernel(kernel: Callable, x, reps: int = 3,
                target_ms: float = 80.0,
                k_pair: tuple[int, int] | None = None,
                aux=None, perturb: str = "dus") -> float:
    """Seconds per kernel invocation (steady state).  ``kernel(x) -> y``.

    The axon fetch floor is ~25 ms, so k is escalated until the k-loop time
    clearly exceeds the floor, then the slope between two k values is taken.

    k_pair: fix (k_small, k_big) instead of auto-escalating — every distinct
    k is a separate ~30 s axon compile, so callers that know the kernel's
    rough cost (e.g. the roofline peak sweep) pass it to cap compiles at 2.

    aux: extra pytree passed through UNperturbed as ``kernel(x, aux)`` —
    use it for large constant operands (filter matrices, carried state):
    the anti-hoisting eps-add would otherwise copy them every iteration,
    charging the kernel for pure measurement overhead.

    CSDR_TIMING_SMOKE=1 runs the kernel exactly once and returns a dummy
    1 s/call — for CI smoke tests of bench rigs on CPU (interpret-mode
    pallas inside a timing loop would take minutes per row).
    """
    import os
    if os.environ.get("CSDR_TIMING_SMOKE"):
        y = kernel(x, aux) if aux is not None else kernel(x)
        float(jax.device_get(_scalarize(y)))
        return 1.0

    def make(k):
        if perturb == "rotate":
            # Streaming-faithful in principle: S identical copies of x ride
            # an HBM stack sized past VMEM (>=48MB); iteration i consumes
            # slice i % S via dynamic_index (loop-dependent, so the kernel
            # cannot hoist), so the consumed buffer can never go
            # VMEM-resident across iterations and there is no eps at all.
            # MEASURED LOSER ON AXON (2026-08-19 A/B): the traced-start
            # dynamic_slice materializes a copy per iteration at ~170 GB/s
            # (identity 61 us, FIR 93 us vs dus 3.7/13.9) — the same
            # dynamic-indexing pathology CLAUDE.md documents.  Kept for
            # backends with cheap dynamic slicing and for A/B; on TPU use
            # 'dus' and size bench inputs past VMEM when residency matters
            # (the affected small-input benches' residency upside is <=3%
            # of per-call time — input_bytes/hbm_bw vs per_call).
            leaves = jax.tree_util.tree_leaves(x)
            xbytes = sum(l.size * l.dtype.itemsize for l in leaves)
            s = max(2, -(-48 * 2**20 // max(xbytes, 1)))
            s = min(s, 64)
            xs = jax.tree_util.tree_map(
                lambda a: jnp.broadcast_to(a, (s,) + a.shape), x)
            # materialize (broadcast_to is a view; the stack must live in
            # HBM so each slice read is a real HBM read)
            xs = jax.tree_util.tree_map(lambda a: a + jnp.zeros((), a.dtype),
                                        xs)

            @jax.jit
            def run(xs, aux_in, seed):
                def body(i, acc):
                    xp = jax.tree_util.tree_map(
                        lambda a: jax.lax.dynamic_index_in_dim(
                            a, i % s, 0, keepdims=False), xs)
                    y = kernel(xp, aux_in) if aux is not None else kernel(xp)
                    return acc + _scalarize(y)
                return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
            return lambda x_, aux_in, seed: run(xs, aux_in, seed)
        if perturb == "dus":
            # i-dependent 1e-30 single-element update: numerically invisible
            # but NOT foldable, so XLA cannot hoist the kernel out of the
            # loop.  The arrays ride the fori_loop CARRY so the update is an
            # in-place dynamic-update-slice (XLA aliases loop-carry
            # buffers): ~4 bytes of traffic per iteration.  The old
            # whole-array eps-add ("add" mode) materialized a full copy of
            # x every iteration — an extra HBM pass (or two) over the input
            # PER CALL charged to the kernel.  On-chip A/B (2026-08-19,
            # bench_timing_ab.py): FIR headline 31.4 -> 47.3 Gsps at the
            # 5.25MB shape and 34.2 -> 51.6 Gsps at 20MB (x too large for
            # any VMEM-carry residency), identity-kernel floor 9.7 ->
            # 3.6 us.  "add" is kept only for A/B-ing the measurement.
            @jax.jit
            def run(x, aux_in, seed):
                def body(i, carry):
                    acc, xc = carry
                    eps = (seed + i.astype(jnp.float32)) * jnp.float32(1e-30)
                    xp = jax.tree_util.tree_map(
                        lambda a: a.at[(0,) * a.ndim].add(
                            eps.astype(a.dtype)), xc)
                    y = kernel(xp, aux_in) if aux is not None else kernel(xp)
                    return acc + _scalarize(y), xp
                acc, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0.0), x))
                return acc
            return run

        @jax.jit
        def run(x, aux_in, seed):
            def body(i, acc):
                # i-dependent 1e-30 perturbation: numerically invisible but
                # NOT foldable, so XLA cannot hoist the kernel out of the loop
                eps = (seed + i.astype(jnp.float32)) * jnp.float32(1e-30)
                xp = jax.tree_util.tree_map(
                    lambda a: a + eps.astype(a.dtype), x)
                y = kernel(xp, aux_in) if aux is not None else kernel(xp)
                return acc + _scalarize(y)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        return run

    def measure(k, r):
        run = make(k)
        float(jax.device_get(run(x, aux, jnp.float32(0))))  # compile + settle
        best = float("inf")
        for i in range(r):
            t0 = time.perf_counter()
            float(jax.device_get(run(x, aux, jnp.float32(i + 1))))
            best = min(best, time.perf_counter() - t0)
        return best

    if k_pair is not None:
        k_small, k_big = k_pair
        t_small = measure(k_small, 2)
        t_big = measure(k_big, 2)
    else:
        # probe: find k_big where loop time dominates the fetch floor
        k_small = 8
        t_small = measure(k_small, 2)
        k_big = 64
        while True:
            t_big = measure(k_big, 2)
            if t_big > max(3 * t_small, target_ms / 1e3) or k_big >= 8192:
                break
            k_big *= 4
    per = (t_big - t_small) / (k_big - k_small)
    # refine with one more rep pair at the chosen sizes
    t_small = min(t_small, measure(k_small, reps - 1) if reps > 1 else t_small)
    t_big = min(t_big, measure(k_big, reps - 1) if reps > 1 else t_big)
    return max((t_big - t_small) / (k_big - k_small), 1e-9)
