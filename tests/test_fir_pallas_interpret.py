"""CPU coverage for the VMEM-slab pallas FIR kernel via interpret mode.

The production kernel (csdr_tpu/kernels/fir_pallas.py, reference hot loop
libcsdr.c:528-549) normally only runs on TPU; CSDR_PALLAS_INTERPRET=1 runs
the same kernel body through the pallas interpreter so every HIGH dot-
packing variant and the HIGHEST path get CI coverage without a chip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from csdr_tpu import firdes
from csdr_tpu.core.cplx import CF
from csdr_tpu.kernels import fir_pallas as fp
from csdr_tpu.ops.fir import fir_decimate_cc


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("CSDR_PALLAS_INTERPRET", "1")


def _mk_input(kout, d, t, seed=0):
    n = kout * d
    tail = ((t - 1 + d - 1) // d) * d
    rng = np.random.default_rng(seed)
    return CF(jnp.asarray(rng.standard_normal(n + tail).astype(np.float32)),
              jnp.asarray(rng.standard_normal(n + tail).astype(np.float32)))


def _snr_db(y, ref_r, ref_i):
    perr = float(np.mean((np.asarray(y.re) - ref_r) ** 2
                         + (np.asarray(y.im) - ref_i) ** 2))
    pref = float(np.mean(ref_r ** 2 + ref_i ** 2))
    return 10 * np.log10(pref / max(perr, 1e-300))


def test_vmem_kernel_highest_matches_xla():
    d, t = 10, 1023
    kout = 2 * 64 * 128            # two grid steps at jb=64
    x = _mk_input(kout, d, t)
    taps = np.asarray(firdes.firdes_lowpass_f(t, 0.5 / d), np.float32)
    ref = fir_decimate_cc(x, jnp.asarray(taps), d,
                          jax.lax.Precision.HIGHEST)[:kout]
    y = fp.fir_decimate_vmem(x, taps, d, kout, jax.lax.Precision.HIGHEST)
    assert _snr_db(y, np.asarray(ref.re), np.asarray(ref.im)) > 120


@pytest.mark.parametrize("variant", ["HIGH1", "HIGH2", "HIGH3", "HIGH4",
                                     "HIGH5", "HIGH6"])
def test_vmem_kernel_high_variants(variant):
    """All four dot-packings compute the same bf16x3 product (HIGH4 adds
    the lo*lo term): >=100 dB vs the f32 path, and mutually consistent."""
    d, t = 10, 1023
    kout = 64 * 128
    x = _mk_input(kout, d, t)
    taps = np.asarray(firdes.firdes_lowpass_f(t, 0.5 / d), np.float32)
    ref = fp.fir_decimate_vmem(x, taps, d, kout, jax.lax.Precision.HIGHEST)
    rr, ri = np.asarray(ref.re), np.asarray(ref.im)
    y = fp.fir_decimate_vmem(x, taps, d, kout, variant)
    assert _snr_db(y, rr, ri) > 100


def test_vmem_kernel_small_jb_path():
    """kout below 64*128 takes the jb=8 tile; exercise it."""
    d, t = 10, 1023
    kout = 8 * 128
    x = _mk_input(kout, d, t)
    taps = np.asarray(firdes.firdes_lowpass_f(t, 0.5 / d), np.float32)
    ref = fir_decimate_cc(x, jnp.asarray(taps), d,
                          jax.lax.Precision.HIGHEST)[:kout]
    y = fp.fir_decimate_vmem(x, taps, d, kout, jax.lax.Precision.HIGHEST)
    assert _snr_db(y, np.asarray(ref.re), np.asarray(ref.im)) > 120


def test_vmem_jb_cap_budget():
    # ADVICE r2: jb must shrink with 128*d so the double-buffered input
    # blocks + resident weights stay inside the ~16 MB VMEM core budget.
    assert fp._vmem_jb_cap(10, 1023) == 256      # d=10 fits the jb=256 winner
    caps = [fp._vmem_jb_cap(d, 128 * d) for d in (10, 32, 64, 80)]
    assert caps == sorted(caps, reverse=True)    # monotone non-increasing
    for d, t in [(64, 8192), (80, 10240)]:
        cap = fp._vmem_jb_cap(d, t)
        assert 8 <= cap < 128
        rd = 128 * d
        k2 = 128 * ((max(127 * d + t - rd, 1) + 127) // 128)
        resident = ((rd + max(128, k2)) * 128 * 4      # weights
                    + 2 * 2 * 8 * rd * 4               # halo blocks
                    + cap * (2 * 2 * rd * 4 + 2 * 2 * 128 * 4))
        assert resident <= 14 * 2**20
    # d=128 weights alone exceed VMEM: cap < 8 and the dispatcher must
    # refuse the kernel (fir_decimate_best falls back to XLA Toeplitz)
    assert fp._vmem_jb_cap(128, 16512) < 8


def test_vmem_kernel_rejects_over_budget_default_jb():
    d, t = 128, 16512
    taps = jnp.asarray(np.ones(t, np.float32))
    x = _mk_input(1024 // d + 1, d, t)
    with pytest.raises(ValueError, match="VMEM budget"):
        fp.fir_decimate_vmem(x, taps, d, 1024)


def test_deep_d_default_jb_capped_and_correct():
    # Deep-grid kout would pick jb=128, but deep d caps it (ADVICE r2).
    assert fp._default_jb(10, 1023, 128 * 128) == 128
    deep = fp._default_jb(64, 8191, 128 * 128)
    assert deep == fp._vmem_jb_cap(64, 8191) and deep < 128
    # And the capped jb still computes the right answer (d=64, jb=cap).
    d, t = 64, 1023
    kout = 256
    taps = jnp.asarray(firdes.firdes_lowpass_f(t, 0.4 / d))
    x = _mk_input(kout, d, t)
    ref = fir_decimate_cc(x, taps, d, jax.lax.Precision.HIGHEST)[:kout]
    y = fp.fir_decimate_vmem(x, taps, d, kout,
                             jb=fp._vmem_jb_cap(d, t))
    assert _snr_db(y, np.asarray(ref.re), np.asarray(ref.im)) > 90


# ---------------------------------------------------------------------------
# NCO-fused shift+FIR kernel (VERDICT r4 #1)
# ---------------------------------------------------------------------------

def test_vmem_shift_kernel_matches_shift_then_fir():
    """fir_decimate_vmem_shift == shift_cc then valid-mode FIR, at both a
    zero and a nonzero start phase, long and SHORT taps (the fused kernel
    serves the 81-tap WFM front end too)."""
    from csdr_tpu.ops.shift import shift_cc
    for d, t, rate, phase in ((10, 1023, -0.2, 0.0),
                              (10, 81, 0.137, 0.3),
                              (4, 243, -0.05, 0.9)):
        kout = 16 * 128
        x = _mk_input(kout, d, t, seed=3)
        taps = np.asarray(firdes.firdes_lowpass_f(t, 0.5 / d), np.float32)
        sh, _ = shift_cc(x, rate, phase=2 * np.pi * phase)
        ref = fir_decimate_cc(sh, jnp.asarray(taps), d,
                              jax.lax.Precision.HIGHEST)[:kout]
        y = fp.fir_decimate_vmem_shift(x, jnp.asarray(taps), d, kout, rate,
                                       jnp.float32(phase),
                                       jax.lax.Precision.HIGHEST, jb=8)
        snr = _snr_db(y, np.asarray(ref.re), np.asarray(ref.im))
        assert snr > 110, (d, t, rate, phase, snr)


def test_vmem_shift_kernel_high_variant():
    from csdr_tpu.ops.shift import shift_cc
    d, t, rate = 10, 1023, -0.21
    kout = 16 * 128
    x = _mk_input(kout, d, t, seed=5)
    taps = np.asarray(firdes.firdes_lowpass_f(t, 0.5 / d), np.float32)
    sh, _ = shift_cc(x, rate)
    ref = fir_decimate_cc(sh, jnp.asarray(taps), d,
                          jax.lax.Precision.HIGHEST)[:kout]
    y = fp.fir_decimate_vmem_shift(x, jnp.asarray(taps), d, kout, rate,
                                   jnp.float32(0.0),
                                   jax.lax.Precision.HIGH, jb=8)
    snr = _snr_db(y, np.asarray(ref.re), np.asarray(ref.im))
    assert snr > 95, snr         # bf16x3 bound, same as the unfused HIGH


def test_shifted_fir_block_streaming_matches_serial_chain():
    """The fused streaming block == shift_block | fir_decimate_block fed
    the same chunks (phase carried across chunk boundaries)."""
    from csdr_tpu.core.block import Pipeline
    from csdr_tpu.ops import fir as fir_ops, shift as shift_ops
    d, t, rate = 10, 81, -0.2
    chunk = 8 * 128 * d           # kout=1024 per chunk
    nchunks = 3
    taps = np.asarray(firdes.firdes_lowpass_f(t, 0.5 / d), np.float32)
    rng = np.random.default_rng(11)
    xs = [CF(jnp.asarray(rng.standard_normal(chunk).astype(np.float32)),
             jnp.asarray(rng.standard_normal(chunk).astype(np.float32)))
          for _ in range(nchunks)]
    serial = Pipeline([shift_ops.shift_block(rate),
                       fir_ops.fir_decimate_block(taps, d, use_pallas=False)])
    fused = fir_ops.shifted_fir_decimate_block(rate, taps, d,
                                               force_fused=True)
    st_s, st_f = serial.init(), fused.init()
    for i, x in enumerate(xs):
        st_s, ys = serial.apply(st_s, x)
        st_f, yf = fused.apply(st_f, x)
        snr = _snr_db(yf, np.asarray(ys.re), np.asarray(ys.im))
        assert snr > 110, (i, snr)


def test_shifted_fir_block_fallback_matches_fused():
    """force_fused=False (the serial composition inside the block) agrees
    with the fused kernel — the A/B pair used for on-chip measurement."""
    from csdr_tpu.ops import fir as fir_ops
    d, t, rate = 10, 81, 0.11
    chunk = 8 * 128 * d
    taps = np.asarray(firdes.firdes_lowpass_f(t, 0.5 / d), np.float32)
    rng = np.random.default_rng(12)
    x = CF(jnp.asarray(rng.standard_normal(chunk).astype(np.float32)),
           jnp.asarray(rng.standard_normal(chunk).astype(np.float32)))
    a = fir_ops.shifted_fir_decimate_block(rate, taps, d, force_fused=True)
    b = fir_ops.shifted_fir_decimate_block(rate, taps, d, force_fused=False)
    sa, ya = a.apply(a.init(), x)
    sb, yb = b.apply(b.init(), x)
    snr = _snr_db(ya, np.asarray(yb.re), np.asarray(yb.im))
    assert snr > 110, snr
    np.testing.assert_allclose(np.asarray(sa[0]), np.asarray(sb[0]))


def test_shifted_fir_block_zero_concat_path():
    """Chunks with n % (128*d) == 0 and enough rows take the zero-concat
    split (kernel on x directly + tiny edge FIRs + output concat); must
    match the serial shift|fir chain across chunk boundaries, exercising
    head, big-kernel, and tail-end parts."""
    from csdr_tpu.core.block import Pipeline
    from csdr_tpu.ops import fir as fir_ops, shift as shift_ops
    d, t, rate = 10, 81, -0.2
    chunk = 24 * 128 * d          # rows=24 -> jb=8, g=2: all three parts
    taps = np.asarray(firdes.firdes_lowpass_f(t, 0.5 / d), np.float32)
    rng = np.random.default_rng(21)
    xs = [CF(jnp.asarray(rng.standard_normal(chunk).astype(np.float32)),
             jnp.asarray(rng.standard_normal(chunk).astype(np.float32)))
          for _ in range(3)]
    serial = Pipeline([shift_ops.shift_block(rate),
                       fir_ops.fir_decimate_block(taps, d, use_pallas=False)])
    fused = fir_ops.shifted_fir_decimate_block(rate, taps, d,
                                               force_fused=True)
    st_s, st_f = serial.init(), fused.init()
    for i, x in enumerate(xs):
        st_s, ys = serial.apply(st_s, x)
        st_f, yf = fused.apply(st_f, x)
        assert yf.shape[0] == ys.shape[0] == chunk // d
        snr = _snr_db(yf, np.asarray(ys.re), np.asarray(ys.im))
        assert snr > 110, (i, snr)


@pytest.mark.parametrize("d,t,chunk_rows", [
    (50, 81, 24),     # the NFM front shape class: short taps, Toeplitz body
    (10, 81, 24),     # WFM front class
    (50, 41, 16),     # t < d: head needs NO x samples (head_need < tail_len)
    (10, 1023, 24),   # long taps: vmem-kernel body dispatch
])
def test_fir_decimate_block_zero_concat_matches_concat(d, t, chunk_rows):
    """The plain (unshifted) fir_decimate_block's zero-concat split must
    equal the tail-concat reference across chunk boundaries (head, body,
    and tail-end parts all exercised), for both Toeplitz- and vmem-body
    dispatch shapes."""
    from csdr_tpu.ops import fir as fir_ops
    chunk = chunk_rows * 128 * d
    taps = np.asarray(firdes.firdes_lowpass_f(t, 0.5 / d), np.float32)
    rng = np.random.default_rng(31)
    xs = [CF(jnp.asarray(rng.standard_normal(chunk).astype(np.float32)),
             jnp.asarray(rng.standard_normal(chunk).astype(np.float32)))
          for _ in range(3)]
    ref = fir_ops.fir_decimate_block(taps, d, use_pallas=False,
                                     force_zerocat=False)
    zc = fir_ops.fir_decimate_block(taps, d, use_pallas=False,
                                    force_zerocat=True)
    st_r, st_z = ref.init(), zc.init()
    for i, x in enumerate(xs):
        st_r, yr = ref.apply(st_r, x)
        st_z, yz = zc.apply(st_z, x)
        assert yz.shape[0] == yr.shape[0] == chunk // d
        snr = _snr_db(yz, np.asarray(yr.re), np.asarray(yr.im))
        assert snr > 135, (i, snr)   # identical windows, float-assoc only
        np.testing.assert_allclose(np.asarray(st_z.re), np.asarray(st_r.re))


@pytest.mark.parametrize("d,t", [
    (10, 1023),   # long taps: the t >= vmem_min_t dispatch
    (50, 81),     # short taps, deep d: the d >= 32 vmem-body rule (NFM front)
])
def test_fir_decimate_block_zero_concat_pallas_body(d, t):
    """Zero-concat with the pallas dispatch (interpret mode): the vmem
    body kernel on x AS IS + tiny edge FIRs equals the serial chain."""
    from csdr_tpu.ops import fir as fir_ops
    chunk = 24 * 128 * d
    taps = np.asarray(firdes.firdes_lowpass_f(t, 0.5 / d), np.float32)
    rng = np.random.default_rng(32)
    xs = [CF(jnp.asarray(rng.standard_normal(chunk).astype(np.float32)),
             jnp.asarray(rng.standard_normal(chunk).astype(np.float32)))
          for _ in range(2)]
    ref = fir_ops.fir_decimate_block(taps, d, use_pallas=False,
                                     force_zerocat=False)
    zc = fir_ops.fir_decimate_block(taps, d, use_pallas=True,
                                    force_zerocat=True)
    st_r, st_z = ref.init(), zc.init()
    for i, x in enumerate(xs):
        st_r, yr = ref.apply(st_r, x)
        st_z, yz = zc.apply(st_z, x)
        assert yz.shape[0] == yr.shape[0] == chunk // d
        snr = _snr_db(yz, np.asarray(yr.re), np.asarray(yr.im))
        assert snr > 110, (i, snr)
