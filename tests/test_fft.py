"""Planar Stockham FFT vs numpy (the framework's FFT backend, core/fft.py)."""

import numpy as np
import pytest

from csdr_tpu.core import fft as cfft
from tests.util import to_dev, to_host, assert_snr, cplx_noise


@pytest.mark.parametrize("n", [8, 256, 1024, 4096])
def test_fft_matches_numpy(n):
    x = cplx_noise(n, seed=n)
    ours = to_host(cfft.fft(to_dev(x)))
    ref = np.fft.fft(x)
    assert_snr(ref, ours, 110, f"fft {n}")


def test_fft_batched():
    x = (np.random.default_rng(1).standard_normal((7, 512))
         + 1j * np.random.default_rng(2).standard_normal((7, 512))).astype(np.complex64)
    ours = to_host(cfft.fft(to_dev(x)))
    ref = np.fft.fft(x, axis=-1)
    assert_snr(ref, ours, 110, "batched fft")


def test_ifft_roundtrip():
    x = cplx_noise(2048, seed=3)
    back = to_host(cfft.ifft(cfft.fft(to_dev(x)), normalize=True))
    assert_snr(x, back, 110, "fft roundtrip")


def test_swap_sides():
    x = cplx_noise(64, seed=4)
    ours = to_host(cfft.fft_swap_sides(to_dev(x)))
    np.testing.assert_allclose(ours, np.fft.fftshift(x), rtol=1e-6)


def test_next_pow2():
    # matches reference semantics: smallest power of two STRICTLY greater
    assert cfft.next_pow2(81 * 4) == 512
    assert cfft.next_pow2(512) == 1024
    assert cfft.next_pow2(1) == 2
