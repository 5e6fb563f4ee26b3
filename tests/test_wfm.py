"""End-to-end: WFM receiver (BASELINE config 1) vs composed reference kernels,
streamed in chunks — the A/B acceptance pattern of BASELINE.md."""

import jax.numpy as jnp
import numpy as np

from csdr_tpu.core.block import VarOut
from csdr_tpu.models import wfm
from csdr_tpu.ops import resamp
from tests.util import refbind, assert_snr, to_dev, to_host


def _fm_signal(n, seed=0, dev=0.2):
    rng = np.random.default_rng(seed)
    audio = np.convolve(rng.standard_normal(n), np.ones(50) / 50, mode="same")
    phase = np.cumsum(dev * audio)
    return np.exp(1j * 2 * np.pi * phase).astype(np.complex64), audio


def _run_pipeline_chunks(pipe, x, n_chunk):
    st = pipe.init()
    outs = []
    for c in range(len(x) // n_chunk):
        chunk = x[c * n_chunk:(c + 1) * n_chunk]
        xin = to_dev(chunk) if np.iscomplexobj(chunk) else jnp.asarray(chunk)
        st, y = pipe.apply(st, xin)
        if isinstance(y, VarOut):
            outs.append(np.asarray(y.data)[: int(y.count)])
        else:
            outs.append(np.asarray(y))
    return np.concatenate(outs)


def _reference_wfm(x, rate=5.0, tau=50e-6, audio_rate=48000):
    demod = refbind.fmdemod_quadri_cf(x)
    d = refbind.fractional_decimator_init(rate, 12, None)
    dec, _ = refbind.fractional_decimator_ff(demod, d)
    return refbind.deemphasis_wfm_ff(dec, tau, audio_rate)


def test_fractional_decimator_matches_reference():
    rng = np.random.default_rng(7)
    x = np.convolve(rng.standard_normal(20000), np.ones(8) / 8, "same").astype(np.float32)
    d = refbind.fractional_decimator_init(5.0, 12, None)
    ref, in_proc = refbind.fractional_decimator_ff(x, d)
    blk = resamp.fractional_decimator_block(5.0, 12)
    st = blk.init()
    outs = []
    for c in range(4):
        st, y = blk.apply(st, jnp.asarray(x[c * 5000:(c + 1) * 5000]))
        outs.append(np.asarray(y.data)[: int(y.count)])
    ours = np.concatenate(outs)
    m = min(len(ref), len(ours))
    assert m > 3500
    assert_snr(ref[:m], ours[:m], 90, "fractional decimator")


def test_fractional_decimator_with_prefilter():
    from csdr_tpu import firdes
    taps = firdes.firdes_lowpass_f(41, 0.08)
    rng = np.random.default_rng(8)
    x = rng.standard_normal(20000).astype(np.float32)
    d = refbind.fractional_decimator_init(3.5, 12, taps)
    ref, _ = refbind.fractional_decimator_ff(x, d)
    blk = resamp.fractional_decimator_block(3.5, 12, taps=taps)
    st = blk.init()
    outs = []
    for c in range(4):
        st, y = blk.apply(st, jnp.asarray(x[c * 5000:(c + 1) * 5000]))
        outs.append(np.asarray(y.data)[: int(y.count)])
    ours = np.concatenate(outs)
    m = min(len(ref), len(ours))
    assert m > 2000
    assert_snr(ref[:m], ours[:m], 85, "frac decimator + prefilter")


def test_fractional_decimator_rational_path_golden():
    """Rational rates (den<=64) take the slab-matmul path (no gather,
    ROADMAP r1 #3); golden vs the reference C at 2.5 = 5/2 and stream-
    equal to the generic gather path at several rates."""
    rng = np.random.default_rng(9)
    x = np.convolve(rng.standard_normal(20000), np.ones(8) / 8,
                    "same").astype(np.float32)
    d = refbind.fractional_decimator_init(2.5, 12, None)
    ref, _ = refbind.fractional_decimator_ff(x, d)
    blk = resamp.fractional_decimator_block(2.5, 12)
    st = blk.init()
    outs = []
    for c in range(4):
        st, y = blk.apply(st, jnp.asarray(x[c * 5000:(c + 1) * 5000]))
        outs.append(np.asarray(y.data)[: int(y.count)])
    ours = np.concatenate(outs)
    m = min(len(ref), len(ours))
    assert m > 7000
    assert_snr(ref[:m], ours[:m], 90, "rational fractional decimator")

    # stream equality vs the generic path (exact for representable rates;
    # ~f32-phase-noise for rates like 2.4 where the generic/reference
    # accumulate k*rate in float32 and the rational path is exact)
    for rate, bar in [(3.5, 120.0), (6.25, 120.0), (2.4, 55.0)]:
        bg = resamp.fractional_decimator_block(rate, 12, rational=False)
        br = resamp.fractional_decimator_block(rate, 12)
        assert br is not bg
        sg, sr = bg.init(), br.init()
        og, orr = [], []
        for c in range(4):
            chunk = jnp.asarray(x[c * 5000:(c + 1) * 5000])
            sg, yg = bg.apply(sg, chunk)
            sr, yr = br.apply(sr, chunk)
            og.append(np.asarray(yg.data)[: int(yg.count)])
            orr.append(np.asarray(yr.data)[: int(yr.count)])
        og, orr = np.concatenate(og), np.concatenate(orr)
        m = min(len(og), len(orr))
        assert len(og) - len(orr) < 12 * 4   # only per-chunk deferral
        assert_snr(og[:m], orr[:m], bar, f"rational vs generic rate={rate}")


def test_wfm_basic_end_to_end():
    x, _ = _fm_signal(48000)
    ref = _reference_wfm(x)
    pipe = wfm.wfm_basic()
    ours = _run_pipeline_chunks(pipe, x, 8000)
    m = min(len(ref), len(ours))
    assert m > 8000
    assert_snr(ref[:m], ours[:m], 60, "WFM basic chain")


def test_rational_decimator_backlog_drains():
    """rate 2.4 fed 246-sample chunks: den-quantized emission leaves up to
    den-1 outputs buffered; the capacity must allow draining that backlog
    on the next chunk or occupancy grows until the carry buffer silently
    clamps (reproduced pre-fix: divergence from output 402)."""
    import jax.numpy as jnp
    from csdr_tpu.ops.resamp import fractional_decimator_block

    rng = np.random.default_rng(3)
    x = (0.3 * rng.standard_normal(246 * 40)).astype(np.float32)
    # golden: generic path, one shot
    gold_blk = fractional_decimator_block(2.4, rational=False)
    _, gold = gold_blk.apply(gold_blk.init(), jnp.asarray(x))
    g = np.asarray(gold.data)[: int(gold.count)]
    # streamed rational path in 246-sample chunks
    blk = fractional_decimator_block(2.4)
    st = blk.init()
    outs = []
    for i in range(40):
        st, out = blk.apply(st, jnp.asarray(x[i * 246:(i + 1) * 246]))
        outs.append(np.asarray(out.data)[: int(out.count)])
        occ = int(st[1])
        assert occ <= st[0].shape[0], "carry buffer overflow"
    y = np.concatenate(outs)
    m = min(len(y), len(g))
    assert m > 3500, m
    # the two paths differ only in Lagrange-weight arithmetic (exact f64
    # host constants vs f32 on device); corruption pre-fix was O(1)
    assert_snr(g[:m], y[:m], 55, "rational stream vs generic one-shot")


def test_fractional_decimator_short_first_chunk_state():
    """A first chunk too short to emit must not desync occ/where
    (input_processed went to -1 pre-fix)."""
    import jax.numpy as jnp
    from csdr_tpu.ops.resamp import fractional_decimator_block

    rng = np.random.default_rng(4)
    x = (0.3 * rng.standard_normal(400)).astype(np.float32)
    gold_blk = fractional_decimator_block(5.0, rational=False)
    _, gold = gold_blk.apply(gold_blk.init(), jnp.asarray(x))
    g = np.asarray(gold.data)[: int(gold.count)]
    blk = fractional_decimator_block(5.0, rational=False)
    st = blk.init()
    outs = []
    for i in range(40):                  # constant 10-sample chunks; the
        st, out = blk.apply(st, jnp.asarray(x[i * 10:(i + 1) * 10]))
        outs.append(np.asarray(out.data)[: int(out.count)])
    y = np.concatenate(outs)
    m = min(len(y), len(g))
    assert m > 60
    np.testing.assert_allclose(y[:m], g[:m], rtol=0, atol=2e-4)
