"""Column-major two-level scan layout (round 2): the shared affine-prefix
helper and the AGC's internal scans run along the SUBLANE axis of a
(SUB, 128) block (13x faster than lane-axis scans on the axon backend).
These tests pin the layout algebra exactly against flat references."""

import jax
import jax.numpy as jnp
import numpy as np

from csdr_tpu.ops.demod import _affine_prefix_2level


def test_affine_prefix_cm_matches_flat():
    rng = np.random.default_rng(0)
    for n in (1, 7, 127, 128, 129, 4096, 50_001):
        a = (0.99 + 0.02 * rng.random(n)).astype(np.float32)
        b = (0.01 * rng.standard_normal(n)).astype(np.float32)
        y0 = 1.7

        def comb(l, r):
            return l[0] * r[0], l[1] * r[0] + r[1]

        ca, cb = jax.lax.associative_scan(comb, (jnp.asarray(a),
                                                 jnp.asarray(b)))
        ref = np.asarray(ca) * y0 + np.asarray(cb)
        got = np.asarray(_affine_prefix_2level(jnp.asarray(a),
                                               jnp.asarray(b), y0))
        scale = np.abs(ref).max() + 1e-9
        assert np.abs(got - ref).max() / scale < 1e-5, n


def test_affine_prefix_cm_sequential_exact():
    """Bit-level agreement with the sequential recurrence within float
    reordering tolerance, on a long stream."""
    rng = np.random.default_rng(1)
    n = 10_000
    a = (0.995 + 0.01 * rng.random(n)).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    y0 = 0.3
    y_seq = np.empty(n, np.float64)
    acc = y0
    for i in range(n):
        acc = float(a[i]) * acc + float(b[i])
        y_seq[i] = acc
    got = np.asarray(_affine_prefix_2level(jnp.asarray(a), jnp.asarray(b),
                                           y0))
    err = np.abs(got - y_seq)
    assert err.max() / (np.abs(y_seq).max() + 1e-9) < 1e-4


def test_dcblock_streaming_matches_sequential():
    from csdr_tpu.ops import util_ops
    rng = np.random.default_rng(2)
    x = (rng.standard_normal(30_000) + 0.8).astype(np.float32)
    # sequential reference
    a = 0.999
    y_ref = np.empty_like(x)
    li, lo = 0.0, 0.0
    for i, xi in enumerate(x):
        lo = xi - li + a * lo
        li = xi
        y_ref[i] = lo
    blk = util_ops.dcblock_block()
    st = blk.init()
    outs = []
    for c in range(3):
        st, y = blk.apply(st, jnp.asarray(x[c * 10_000:(c + 1) * 10_000]))
        outs.append(np.asarray(y))
    got = np.concatenate(outs)
    assert np.abs(got - y_ref).max() / (np.abs(y_ref).max() + 1e-9) < 1e-4


def test_time_kernel_perturb_modes_agree():
    # the 'dus' in-place perturbation (measurement-overhead fix) and the
    # legacy whole-array 'add' must measure the same kernel semantics
    import jax.numpy as jnp
    from csdr_tpu.core.cplx import CF
    from csdr_tpu.utils.timing import time_kernel
    x = CF(jnp.arange(4096, dtype=jnp.float32),
           jnp.arange(4096, dtype=jnp.float32))
    k = lambda x: CF(x.re * 2.0, x.im + 1.0)
    a = time_kernel(k, x, k_pair=(4, 16), perturb="add")
    b = time_kernel(k, x, k_pair=(4, 16), perturb="dus")
    assert a > 0 and b > 0
