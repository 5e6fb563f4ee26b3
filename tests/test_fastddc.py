"""Golden tests: fastddc channelizer vs the reference (init math exact,
stream output within SNR bound — the grc_tests/test_fastddc.grc pattern)."""

import numpy as np
import pytest

from csdr_tpu.core import cplx
from csdr_tpu.core.block import VarOut
from csdr_tpu.ops import fastddc
from tests.util import (refbind, assert_snr, cplx_noise, to_dev, to_host,
                        interpret_is_exact)


@pytest.mark.parametrize("d,rate", [(8, 0.1), (4, -0.2), (20, 0.05), (1, 0.0),
                                    (50, 0.2), (64, -0.3)])
def test_init_math_matches_reference(d, rate):
    ours = fastddc.fastddc_init(0.05, d, rate)
    ref = refbind.fastddc_init(0.05, d, rate)
    for f in ("pre_decimation", "post_decimation", "taps_length", "fft_size",
              "fft_inv_size", "input_size", "post_input_size", "startbin",
              "v", "offsetbin", "scrap", "overlap_length"):
        assert getattr(ours, f) == getattr(ref, f), f
    assert abs(ours.post_shift - ref.post_shift) < 1e-6
    assert abs(ours.pre_shift - ref.pre_shift) < 1e-6


@pytest.mark.parametrize("d,rate", [(8, 0.1), (4, -0.2), (16, 0.05),
                                    (20, -0.15), (50, 0.2)])
def test_fastddc_stream_matches_reference(d, rate):
    ddc = fastddc.fastddc_init(0.05, d, rate)
    nframes = 6
    n = nframes * ddc.input_size
    x = cplx_noise(n, seed=42)

    ref, _ = refbind.fastddc_reference(x, d, rate)

    fwd = fastddc.fastddc_fwd_block(ddc)
    inv = fastddc.fastddc_inv_block(ddc, [rate])
    sf = fwd.init()
    si = inv.init()
    sf, spectra = fwd.apply(sf, to_dev(x))
    si, out = inv.apply(si, spectra)
    ours = to_host(out.data)[0][: int(np.asarray(out.count)[0])]

    m = min(len(ref), len(ours))
    assert m > 0, "no output"
    assert len(ours) == len(ref), (len(ours), len(ref))
    assert_snr(ref[:m], ours[:m], 85, f"fastddc D={d} rate={rate}")


def test_fastddc_multichannel_batch():
    """Channel outputs of the batched inverse == per-channel runs."""
    d = 8
    rates = [0.1, -0.15, 0.3]
    ddc = fastddc.fastddc_init(0.05, d, rates[0])
    n = 4 * ddc.input_size
    x = cplx_noise(n, seed=7)
    fwd = fastddc.fastddc_fwd_block(ddc)
    sf, spectra = fwd.apply(fwd.init(), to_dev(x))

    inv_all = fastddc.fastddc_inv_block(ddc, rates)
    _, out_all = inv_all.apply(inv_all.init(), spectra)
    for ci, r in enumerate(rates):
        inv_one = fastddc.fastddc_inv_block(ddc, [r])
        _, out_one = inv_one.apply(inv_one.init(), spectra)
        a = to_host(out_all.data)[ci][: int(np.asarray(out_all.count)[ci])]
        b = to_host(out_one.data)[0][: int(np.asarray(out_one.count)[0])]
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_classed_inverse_streaming_chunks():
    """D=50 (phase-classed path): two q-aligned chunks == one shot (NCO
    phase + class alignment carried)."""
    d, rate = 50, 0.2
    ddc = fastddc.fastddc_init(0.05, d, rate)
    q = d // np.gcd(ddc.post_input_size, ddc.post_decimation)
    nframes = 2 * 25
    n = nframes * ddc.input_size
    x = cplx_noise(n, seed=7)

    fwd = fastddc.fastddc_fwd_block(ddc)
    inv = fastddc.fastddc_inv_block(ddc, [rate])
    _, spectra = fwd.apply(fwd.init(), to_dev(x))

    si, out1 = inv.apply(inv.init(), spectra)
    once = to_host(out1.data)[0][: int(np.asarray(out1.count)[0])]

    si = inv.init()
    parts = []
    half = nframes // 2
    for sl in (slice(0, half), slice(half, nframes)):
        si, o = inv.apply(si, fastddc.CF(spectra.re[sl], spectra.im[sl]))
        parts.append(to_host(o.data)[0][: int(np.asarray(o.count)[0])])
    streamed = np.concatenate(parts)
    m = min(len(once), len(streamed))
    np.testing.assert_allclose(streamed[:m].real, once[:m].real, atol=2e-5)
    np.testing.assert_allclose(streamed[:m].imag, once[:m].imag, atol=2e-5)


def test_factored_inverse_equals_fused():
    """The factored inverse (class-sum + per-channel rolled iDFT,
    ops/fastddc.fastddc_inv_factored_batch) is the same linear map as the
    fused dense matrix — exact up to f32 reassociation."""
    import jax
    import jax.numpy as jnp
    from csdr_tpu.core.cplx import CF
    from csdr_tpu.ops import fastddc as fd

    ddc = fd.fastddc_init(0.05, 16)
    rates = [0.1, -0.23, 0.37, 0.02]
    rng = np.random.default_rng(0)
    b = 16
    sp = (rng.standard_normal((b, ddc.fft_size))
          + 1j * rng.standard_normal((b, ddc.fft_size))).astype(np.complex64)
    spectra = CF(jnp.asarray(sp.real), jnp.asarray(sp.imag))
    cols = [fd.channel_fused_matrix(ddc, r) for r in rates]
    g = np.concatenate([gg for gg, _ in cols], axis=1)
    m = ddc.post_input_size // ddc.post_decimation
    zf = (sp @ g).reshape(b, len(rates), m).transpose(1, 0, 2)
    tq, e, cyc = fd.channel_factored_arrays(ddc, rates)
    y = fd.fastddc_inv_factored_batch(
        spectra, CF(jnp.asarray(tq.real), jnp.asarray(tq.imag)),
        CF(jnp.asarray(e.real), jnp.asarray(e.imag)),
        precision=jax.lax.Precision.HIGHEST)
    yy = np.asarray(y.re) + 1j * np.asarray(y.im)
    assert np.abs(yy - zf).max() / np.abs(zf).max() < 1e-5


def test_factored2_inverse_equals_fused():
    """The factored-v2 inverse (VPU fold + ONE shared iDFT matmul + output
    diagonal, ops/fastddc.fastddc_inv_factored2_batch) is the same linear
    map as the fused dense matrix — the roll-to-diagonal identity is exact
    for integer output times."""
    import jax
    import jax.numpy as jnp
    from csdr_tpu.core.cplx import CF
    from csdr_tpu.ops import fastddc as fd

    ddc = fd.fastddc_init(0.05, 16)
    rates = [0.1, -0.23, 0.37, 0.02]
    rng = np.random.default_rng(1)
    b = 16
    sp = (rng.standard_normal((b, ddc.fft_size))
          + 1j * rng.standard_normal((b, ddc.fft_size))).astype(np.complex64)
    spectra = CF(jnp.asarray(sp.real), jnp.asarray(sp.imag))
    cols = [fd.channel_fused_matrix(ddc, r) for r in rates]
    g = np.concatenate([gg for gg, _ in cols], axis=1)
    m = ddc.post_input_size // ddc.post_decimation
    zf = (sp @ g).reshape(b, len(rates), m).transpose(1, 0, 2)
    tq, w, d, cyc = fd.channel_factored2_arrays(ddc, rates)
    tq_e, e, cyc_e = fd.channel_factored_arrays(ddc, rates)
    np.testing.assert_allclose(cyc, cyc_e)
    # the diagonal identity itself: E_c == W * d_c (columns scaled)
    for ci in range(len(rates)):
        np.testing.assert_allclose(e[ci], w * d[ci][None, :], rtol=2e-5,
                                   atol=2e-6)
    y = fd.fastddc_inv_factored2_batch(
        spectra, CF(jnp.asarray(tq.real), jnp.asarray(tq.imag)),
        CF(jnp.asarray(w.real), jnp.asarray(w.imag)),
        CF(jnp.asarray(d.real), jnp.asarray(d.imag)),
        precision=jax.lax.Precision.HIGHEST)
    yy = np.asarray(y.re) + 1j * np.asarray(y.im)
    assert np.abs(yy - zf).max() / np.abs(zf).max() < 1e-5


def test_channelizer_block_equals_fwd_plus_inverse(monkeypatch):
    """The fully-fused channelizer (subsequence-split DFT matmul + factored
    vmem inverse, no standalone FFT) matches fastddc_fwd_block +
    _fastddc_inv_fused_block streamed over chunks, on both the kernel path
    (b multiple of 128, interpret mode) and the XLA fallback."""
    import jax.numpy as jnp
    from csdr_tpu.core.cplx import CF
    from csdr_tpu.ops import fastddc as fd

    monkeypatch.setenv("CSDR_PALLAS_INTERPRET", "1")
    ddc = fd.fastddc_init(0.05, 16)
    rates = [0.1, -0.23, 0.37, 0.02, -0.07, 0.31, -0.4, 0.18]
    rng = np.random.default_rng(4)
    fwd = fd.fastddc_fwd_block(ddc)
    inv = fd._fastddc_inv_fused_block(ddc, rates)
    chan = fd.fastddc_channelizer_block(ddc, rates, precision="HIGHEST")
    sf, si, sc = fwd.init(), inv.init(), chan.init()
    for b in (128, 48):          # kernel path, then XLA fallback
        x = (rng.standard_normal(b * ddc.input_size)
             + 1j * rng.standard_normal(b * ddc.input_size)
             ).astype(np.complex64)
        xc = CF(jnp.asarray(x.real), jnp.asarray(x.imag))
        sf, spectra = fwd.apply(sf, xc)
        si, oref = inv.apply(si, spectra)
        sc, oc = chan.apply(sc, xc)
        a = np.asarray(oref.data.re) + 1j * np.asarray(oref.data.im)
        v = np.asarray(oc.data.re) + 1j * np.asarray(oc.data.im)
        assert np.array_equal(np.asarray(oref.count), np.asarray(oc.count))
        assert np.abs(a - v).max() / np.abs(a).max() < 5e-5


def test_vmem_inverse_block_equals_fused_block(monkeypatch):
    """The TPU production inverse block (factored-v2 pallas kernel,
    interpret-mode here) matches the fused dense-matmul block on both the
    kernel path (b multiple of 128) and the XLA fallback (ragged b),
    including the carried NCO phase across chunks."""
    import jax
    import jax.numpy as jnp
    from csdr_tpu.core.cplx import CF
    from csdr_tpu.ops import fastddc as fd

    monkeypatch.setenv("CSDR_PALLAS_INTERPRET", "1")
    ddc = fd.fastddc_init(0.05, 16)
    rates = [0.1, -0.23, 0.37, 0.02, -0.07, 0.31, -0.4, 0.18]
    rng = np.random.default_rng(3)
    fused = fd._fastddc_inv_fused_block(ddc, rates)
    vmem = fd._fastddc_inv_vmem_block(ddc, rates, precision="HIGHEST")
    sf, sv = fused.init(), vmem.init()
    for b in (128, 48):          # kernel path, then XLA fallback
        sp = (rng.standard_normal((b, ddc.fft_size))
              + 1j * rng.standard_normal((b, ddc.fft_size))
              ).astype(np.complex64)
        spectra = CF(jnp.asarray(sp.real), jnp.asarray(sp.imag))
        sf, of = fused.apply(sf, spectra)
        sv, ov = vmem.apply(sv, spectra)
        a = np.asarray(of.data.re) + 1j * np.asarray(of.data.im)
        v = np.asarray(ov.data.re) + 1j * np.asarray(ov.data.im)
        assert np.array_equal(np.asarray(of.count), np.asarray(ov.count))
        assert np.abs(a - v).max() / np.abs(a).max() < 2e-5
        np.testing.assert_allclose(np.asarray(sf[0]), np.asarray(sv[0]),
                                   atol=1e-6)


def test_classed_kernel_order_equals_natural(monkeypatch):
    """D=50 classed path with kernel-bin-order spectra (matmul-FFT pallas
    fwd + row-permuted class matrices) streams identically to the natural
    order path."""
    import jax.numpy as jnp
    from csdr_tpu.core.cplx import CF
    from csdr_tpu.ops import fastddc as fd

    ddc = fd.fastddc_init(0.05, 50)
    rates = [0.1, -0.23, 0.31, -0.4]
    rng = np.random.default_rng(9)
    q = fd._class_plan(ddc)[0]
    b = 4 * q
    x = (rng.standard_normal(b * ddc.input_size)
         + 1j * rng.standard_normal(b * ddc.input_size)).astype(np.complex64)
    xc = CF(jnp.asarray(x.real), jnp.asarray(x.imag))

    cases = [("natural", None), ("kernel", None)]
    if interpret_is_exact():
        cases.append(("kernel", "1"))   # interpret emulation: CPU-only exact
    outs = {}
    for mode, env in cases:
        if env:
            monkeypatch.setenv("CSDR_PALLAS_INTERPRET", env)
        else:
            monkeypatch.delenv("CSDR_PALLAS_INTERPRET", raising=False)
        fwd = fd.fastddc_fwd_block(ddc, spectra_order=mode)
        inv = fd.fastddc_inv_block(ddc, rates, spectra_order=mode)
        sf, si = fwd.init(), inv.init()
        sf, spectra = fwd.apply(sf, xc)
        si, o = inv.apply(si, spectra)
        outs[(mode, env)] = np.asarray(o.data.re) + 1j * np.asarray(o.data.im)
    ref = outs[("natural", None)]
    for k, v in outs.items():
        if k == ("natural", None):
            continue
        err = np.abs(v - ref).max() / np.abs(ref).max()
        assert err < 5e-5, (k, err)


def test_channelizer_small_decimation_wide_m():
    """D=4 has m = pis/post = 224 > 128 (pack_w used to overflow its
    hardcoded 128-lane pad) and pre=2 (sublane-unsafe for the vmem kernel
    -> plan gate must route to the XLA factored path).  The fused
    channelizer must build and match the dense fused matrix."""
    import jax
    import jax.numpy as jnp
    from csdr_tpu.core.cplx import CF
    from csdr_tpu.ops import fastddc as fd
    from csdr_tpu.kernels import fastddc_pallas as fpk

    ddc = fd.fastddc_init(0.05, 4)
    m = ddc.post_input_size // ddc.post_decimation
    assert m > 128 and fd.mpad_for(ddc) == 256
    assert fpk.pick_tiles(128, 4, ddc.pre_decimation,
                          ddc.fft_inv_size) is None   # pre=2 rejected
    rates = [0.11, -0.2]
    rng = np.random.default_rng(3)
    n = 8 * ddc.input_size
    x = CF(jnp.asarray(rng.standard_normal(n).astype(np.float32)),
           jnp.asarray(rng.standard_normal(n).astype(np.float32)))
    chan = fd.fastddc_channelizer_block(ddc, rates)
    _, out = chan.apply(chan.init(), x)
    # dense-fused reference: fwd spectra @ per-channel fused matrix
    fwd = fd.fastddc_fwd_block(ddc, spectra_order="natural")
    _, spectra = fwd.apply(fwd.init(), x)
    sp = np.asarray(spectra.re) + 1j * np.asarray(spectra.im)
    for ci, r in enumerate(rates):
        g, cyc = fd.channel_fused_matrix(ddc, r)
        b = sp.shape[0]
        z = (sp @ g).reshape(b, m)
        # per-frame NCO ramp the channelizer applies on top
        k = np.arange(b)
        rot = np.exp(2j * np.pi * ((k * cyc) % 1.0))
        z = (z * rot[:, None]).reshape(-1)
        got = (np.asarray(out.data.re)[ci]
               + 1j * np.asarray(out.data.im)[ci])[: z.size]
        err = np.linalg.norm(got - z) / np.linalg.norm(z)
        assert err < 1e-4, (ci, err)
