"""VMEM matmul-FFT kernel (kernels/fft_pallas.py) vs the Stockham backend
and numpy f64, in interpret mode (the TPU path is exercised by the same code
on the chip; bench_roofline/docs record the measured rates)."""

import numpy as np
import jax.numpy as jnp
import pytest

from csdr_tpu.core.cplx import CF
from csdr_tpu.core import fft as cfft
from csdr_tpu.kernels import fft_pallas as fk


def _rand(b, n, seed=0):
    rng = np.random.default_rng(seed)
    return CF(jnp.asarray(rng.standard_normal((b, n)), jnp.float32),
              jnp.asarray(rng.standard_normal((b, n)), jnp.float32))


def _snr_db(got, ref):
    err = np.abs(got - ref) ** 2
    return 10 * np.log10(np.sum(np.abs(ref) ** 2) / max(np.sum(err), 1e-30))


@pytest.mark.parametrize("n", [128, 256, 512, 1024, 4096])
def test_fwd_matches_numpy(n, monkeypatch):
    monkeypatch.setenv("CSDR_PALLAS_INTERPRET", "1")
    x = _rand(9, n)
    ref = np.fft.fft(np.asarray(x.re, np.float64)
                     + 1j * np.asarray(x.im, np.float64), axis=-1)
    got = fk.fft_ko(x, precision="HIGHEST")
    perm = fk.kernel_perm(n)
    g = np.asarray(got.re)[:, perm] + 1j * np.asarray(got.im)[:, perm]
    assert _snr_db(g, ref) > 120


@pytest.mark.parametrize("n", [256, 1024])
def test_roundtrip_and_stockham_parity(n, monkeypatch):
    monkeypatch.setenv("CSDR_PALLAS_INTERPRET", "1")
    x = _rand(5, n, seed=1)
    ko = fk.fft_ko(x, precision="HIGHEST")
    perm = fk.kernel_perm(n)
    st = cfft.fft(x)
    assert np.allclose(np.asarray(ko.re)[:, perm], np.asarray(st.re),
                       atol=2e-3 * np.sqrt(n))
    back = fk.ifft_ko(ko, precision="HIGHEST")
    assert np.allclose(np.asarray(back.re) / n, np.asarray(x.re), atol=1e-4)
    assert np.allclose(np.asarray(back.im) / n, np.asarray(x.im), atol=1e-4)


def test_high_precision_bf16x3(monkeypatch):
    monkeypatch.setenv("CSDR_PALLAS_INTERPRET", "1")
    n = 1024
    x = _rand(4, n, seed=2)
    ref = np.fft.fft(np.asarray(x.re, np.float64)
                     + 1j * np.asarray(x.im, np.float64), axis=-1)
    got = fk.fft_ko(x, precision="HIGH")
    perm = fk.kernel_perm(n)
    g = np.asarray(got.re)[:, perm] + 1j * np.asarray(got.im)[:, perm]
    assert _snr_db(g, ref) > 95     # manual bf16 hi/lo 3-dot expansion


def test_batch_padding(monkeypatch):
    monkeypatch.setenv("CSDR_PALLAS_INTERPRET", "1")
    n = 256
    x = _rand(3, n, seed=3)          # 3 % bt != 0 -> pad path
    ref = np.fft.fft(np.asarray(x.re, np.float64)
                     + 1j * np.asarray(x.im, np.float64), axis=-1)
    got = fk.fft_ko(x, precision="HIGHEST")
    perm = fk.kernel_perm(n)
    g = np.asarray(got.re)[:, perm] + 1j * np.asarray(got.im)[:, perm]
    assert _snr_db(g, ref) > 120


def test_kernel_perm_is_permutation():
    for n in (128, 256, 2048):
        p = fk.kernel_perm(n)
        assert sorted(p.tolist()) == list(range(n))


def test_ko_to_natural_reorder(monkeypatch):
    monkeypatch.setenv("CSDR_PALLAS_INTERPRET", "1")
    for n in (256, 1024):
        x = _rand(4, n, seed=5)
        nat = fk.fft_natural(x, precision="HIGHEST")
        st = cfft.fft(x)
        assert np.allclose(np.asarray(nat.re), np.asarray(st.re),
                           atol=2e-3 * np.sqrt(n))
        assert np.allclose(np.asarray(nat.im), np.asarray(st.im),
                           atol=2e-3 * np.sqrt(n))


def test_fft_cc_block_kernel_path(monkeypatch):
    """fft_cc through the kernel (interpret) == Stockham path, overlapped
    and skipping modes."""
    from csdr_tpu.ops import spectrum

    for every in (192, 384):           # overlap and skip vs fft_size=256
        blk = spectrum.fft_cc_block(256, every)
        x = _rand(1, every * 6, seed=6)
        flat = CF(x.re[0], x.im[0])
        monkeypatch.setenv("CSDR_PALLAS_INTERPRET", "1")
        s = blk.init()
        _, yk = blk.apply(s, flat)
        monkeypatch.delenv("CSDR_PALLAS_INTERPRET")
        s = blk.init()
        _, yn = blk.apply(s, flat)
        assert np.allclose(np.asarray(yk.re), np.asarray(yn.re), atol=1e-2)
        assert np.allclose(np.asarray(yk.im), np.asarray(yn.im), atol=1e-2)


def test_kill_switch_disables_kernel_everywhere(monkeypatch):
    """CSDR_FFT_KERNEL=0 must flip every supported() gate off, and the
    consumers' fallback (Stockham + order gather) must agree with the
    kernel path bit-for-tolerance."""
    from csdr_tpu.ops import spectrum

    monkeypatch.setenv("CSDR_PALLAS_INTERPRET", "1")
    blk = spectrum.fft_cc_block(256, 256)
    x = _rand(1, 256 * 4, seed=9)
    flat = CF(x.re[0], x.im[0])
    s = blk.init()
    _, yk = blk.apply(s, flat)            # kernel path (interpret)
    monkeypatch.setenv("CSDR_FFT_KERNEL", "0")
    assert not fk.supported(256, 4)
    s = blk.init()
    _, yn = blk.apply(s, flat)            # forced fallback
    assert np.allclose(np.asarray(yk.re), np.asarray(yn.re), atol=1e-2)
    assert np.allclose(np.asarray(yk.im), np.asarray(yn.im), atol=1e-2)
