"""Golden tests: AGC family vs reference (incl. the serial agc_ff as scan)."""

import jax.numpy as jnp
import numpy as np

from csdr_tpu.ops import agc
from tests.util import refbind, assert_snr, cplx_noise, real_noise, to_dev, to_host


def test_agc_ff_matches_reference():
    rng = np.random.default_rng(0)
    # amplitude-modulated noise so attack/decay/hang paths all trigger
    env = 0.1 + np.abs(np.sin(np.arange(8192) / 500))
    x = (env * rng.standard_normal(8192)).astype(np.float32)
    ref, gref = refbind.agc_ff(x, reference=0.8, hang_time=200)
    ours, g = agc.agc_ff(jnp.asarray(x), reference=0.8, hang_time=200)
    assert_snr(ref, np.asarray(ours), 60, "agc_ff")
    assert abs(float(g) - gref) / max(abs(gref), 1e-9) < 1e-2


def test_simple_agc_matches_reference():
    x = cplx_noise(4096, seed=1)
    ref, gref = refbind.simple_agc_cc(x, rate=0.01, reference=0.7)
    ours, g = agc.simple_agc_cc(to_dev(x), rate=0.01, reference=0.7)
    assert_snr(ref, to_host(ours), 70, "simple_agc")
    assert abs(float(g) - gref) < 1e-3


def test_fastagc_three_block_latency():
    n = 1024
    x = real_noise(4 * n, seed=2) * 0.01  # quiet -> gain should rise
    blk = agc.fastagc_block(reference=0.5, block_size=n)
    st = blk.init()
    outs = []
    for c in range(4):
        st, y = blk.apply(st, jnp.asarray(x[c * n:(c + 1) * n]))
        outs.append(np.asarray(y))
    # first two blocks are zeros (lookahead pipeline fill)
    assert np.all(outs[0] == 0) and np.all(outs[1] == 0)
    # third output block is input block 0 amplified
    assert np.abs(outs[2]).mean() > np.abs(x[:n]).mean() * 5


def test_agc_chunked_matches_scan():
    """Waveform-relaxation agc == sequential scan within float reordering,
    across chunk boundaries AND streaming block boundaries (gain + hang
    carried), on signals with attacks, hang stretches, zeros, and max_gain
    clips (near-zero samples)."""
    import jax.numpy as jnp
    from csdr_tpu.ops import agc

    rng = np.random.default_rng(4)
    n = 50_000
    s = ((0.3 + 0.25 * np.sin(2 * np.pi * 0.0007 * np.arange(n)))
         * np.sin(2 * np.pi * 0.043 * np.arange(n))).astype(np.float32)
    s[10_000:10_100] = 0.0
    y_ref, _ = agc.agc_ff(jnp.asarray(s))
    y_c, _, _, conv = agc.agc_ff_chunked(jnp.asarray(s))
    # `conv` is strict mask equality and may flag borderline c==f float
    # ties even when the trajectory is numerically equivalent — the SNR
    # check is the acceptance criterion
    assert_snr(np.asarray(y_ref), np.asarray(y_c), 80, "agc chunked")

    # streaming: two block applies == one (carry correctness)
    blk = agc.agc_block()
    st = blk.init()
    st, y1 = blk.apply(st, jnp.asarray(s[: n // 2]))
    st, y2 = blk.apply(st, jnp.asarray(s[n // 2:]))
    y_stream = np.concatenate([np.asarray(y1), np.asarray(y2)])
    assert_snr(np.asarray(y_ref), y_stream, 75, "agc chunked streaming")


def test_agc_chunked_degenerate_tail():
    """A 0- or 1-sample chunk (e.g. the final EOF chunk of a stream whose
    length is bufsize*k+1) must not crash and must carry state through
    unchanged (ADVICE r1: IndexError on size-0 chunk axis)."""
    y, g, h, conv = agc.agc_ff_chunked(jnp.zeros((0,), jnp.float32),
                                       last_gain=2.5, last_hang=7)
    assert y.shape == (0,) and float(g) == 2.5 and int(h) == 7
    y, g, h, conv = agc.agc_ff_chunked(jnp.asarray([0.5], jnp.float32),
                                       last_gain=2.0, last_hang=3)
    assert np.allclose(np.asarray(y), [1.0]) and float(g) == 2.0 and int(h) == 3
    # streaming: block split at n-1/1 == unsplit
    rng = np.random.default_rng(5)
    s = (0.2 * rng.standard_normal(4097)).astype(np.float32)
    y_ref, _ = agc.agc_ff(jnp.asarray(s))
    blk = agc.agc_block()
    st = blk.init()
    st, y1 = blk.apply(st, jnp.asarray(s[:-1]))
    st, y2 = blk.apply(st, jnp.asarray(s[-1:]))
    y_stream = np.concatenate([np.asarray(y1), np.asarray(y2)])
    assert_snr(np.asarray(y_ref), y_stream, 75, "agc 1-sample tail")


def test_agc_chunked_max_gain_on_zero_run():
    """Long zero run with gain near max_gain: the reference clamps gain
    every sample (outside the input!=0 branch), so the filtered gain must
    settle at ~max_gain*(2-alpha), not grow by (2-alpha)^k (ADVICE r1)."""
    n = 20_000
    s = np.full(n, 1e-6, np.float32)  # drives gain to max fast
    s[4096:] = 0.0                    # then a long zero run
    y_ref, g_ref = agc.agc_ff(jnp.asarray(s), max_gain=100.0)
    y_c, g_c, _, _ = agc.agc_ff_chunked(jnp.asarray(s), max_gain=100.0)
    assert np.isfinite(np.asarray(y_c)).all()
    assert abs(float(g_c) - float(g_ref)) / max(abs(float(g_ref)), 1e-9) < 1e-3
    assert_snr(np.asarray(y_ref), np.asarray(y_c), 80, "agc zero-run clamp")


def test_simple_agc_zero_run_matches_reference():
    """|x|=0 samples: the reference's ref/0 = +inf is clamped DOWN to
    max_gain, so silence RAISES the gain (libcsdr.c:2201-2217) — a
    squelch gap must not collapse the gain toward zero."""
    x = np.zeros(300, np.complex64)
    x[:100] = 0.5
    x[200:] = 0.5
    ref, gref = refbind.simple_agc_cc(x, rate=0.05, reference=0.7,
                                      max_gain=100.0)
    ours, g = agc.simple_agc_cc(to_dev(x), rate=0.05, reference=0.7,
                                max_gain=100.0)
    assert_snr(ref, to_host(ours), 70, "simple_agc zero run")
    assert abs(float(g) - gref) / max(abs(gref), 1e-9) < 1e-4


def test_agc_ff_degenerate_chunks():
    """0- and 1-sample chunks (EOF tails) must not crash and must carry
    state through unchanged — both methods."""
    y, g = agc.agc_ff(jnp.zeros((0,), jnp.float32), last_gain=2.0)
    assert y.shape == (0,) and float(g) == 2.0
    y, g, h, _p, _a = agc.agc_ff(jnp.asarray([0.5], jnp.float32),
                                 last_gain=2.0, last_hang=7, full_state=True)
    assert np.allclose(np.asarray(y), [1.0]) and float(g) == 2.0
    assert int(h) == 7


def test_agc_scan_chunked_agree_across_chunk_boundary():
    """An attack within hang_time of a chunk boundary: both streaming
    methods carry (gain, hang), so their outputs agree on the next chunk
    (the hang freeze is honored by both)."""
    rng = np.random.default_rng(11)
    s = (0.05 * rng.standard_normal(8192)).astype(np.float32)
    s[4090] = 2.0                      # attack 6 samples before the split
    outs = {}
    for method in ("scan", "chunked"):
        blk = agc.agc_block(method=method)
        st = blk.init()
        st, y1 = blk.apply(st, jnp.asarray(s[:4096]))
        st, y2 = blk.apply(st, jnp.asarray(s[4096:]))
        outs[method] = np.concatenate([np.asarray(y1), np.asarray(y2)])
    assert_snr(outs["scan"], outs["chunked"], 80, "scan vs chunked @ hang")
