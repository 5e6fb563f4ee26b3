"""Golden tests: overlap-add FFT bandpass vs an independent numpy model of
the reference algorithm (csdr.c:1810-1886), plus linear-filter ground truth."""

import numpy as np
import pytest

from csdr_tpu import firdes
from csdr_tpu.ops import fftfilt
from csdr_tpu.core import cplx
from tests.util import (assert_snr, cplx_noise, to_dev, to_host,
                        interpret_is_exact)


def _numpy_reference(x, low, high, bw):
    """The reference's exact overlap-add stream math in float64 numpy."""
    t = firdes.firdes_filter_len(bw)
    fft_size, input_size, overlap = fftfilt.fftfilt_plan(t)
    taps = firdes.firdes_bandpass_c(t, low, high).astype(np.complex128)
    tf = np.fft.fft(np.concatenate([taps, np.zeros(fft_size - t)]))
    carry = np.zeros(overlap, np.complex128)
    outs = []
    for s in range(0, len(x) - input_size + 1, input_size):
        frame = np.concatenate([x[s:s + input_size], np.zeros(fft_size - input_size)])
        y = np.fft.ifft(np.fft.fft(frame) * tf)
        # the C adds the carry into the FULL result buffer before the
        # emit/tail split (libcsdr.c:844-849) — overlap may exceed
        # input_size and the tail then cascades across several frames
        y[:overlap] += carry
        outs.append(y[:input_size].copy())
        carry = y[input_size:]
    return np.concatenate(outs)


@pytest.mark.parametrize("low,high,bw", [(0.0, 0.1, 0.01), (-0.2, -0.05, 0.05)])
def test_bandpass_fir_fft_matches_reference_model(low, high, bw):
    blk = fftfilt.bandpass_fir_fft_block(low, high, bw)
    n = 4 * blk.input_size
    x = cplx_noise(n, seed=1)
    ref = _numpy_reference(x, low, high, bw)
    st = blk.init()
    st, y1 = blk.apply(st, to_dev(x[: 2 * blk.input_size]))
    st, y2 = blk.apply(st, to_dev(x[2 * blk.input_size:]))
    ours = np.concatenate([to_host(y1), to_host(y2)])
    assert_snr(ref, ours, 85, "bandpass_fir_fft")


def test_bandpass_is_a_linear_filter():
    """After warmup, the stream equals direct convolution with the taps."""
    low, high, bw = -0.1, 0.2, 0.02
    blk = fftfilt.bandpass_fir_fft_block(low, high, bw)
    t = firdes.firdes_filter_len(bw)
    taps = firdes.firdes_bandpass_c(t, low, high).astype(np.complex128)
    n = 3 * blk.input_size
    x = cplx_noise(n, seed=3)
    st = blk.init()
    st, y = blk.apply(st, to_dev(x))
    ours = to_host(y)
    full = np.convolve(x, taps)[: n]
    assert_snr(full[t:], ours[t:], 85, "bandpass vs direct conv")


def test_kernel_fft_path_matches_fallback(monkeypatch):
    """The matmul-FFT pallas pair (kernel bin order, no reordering) must be
    stream-equal to the Stockham fallback path."""
    if not interpret_is_exact():
        pytest.skip("interpret emulation is only f32-exact on CPU")
    monkeypatch.setenv("CSDR_PALLAS_INTERPRET", "1")
    blk = fftfilt.bandpass_fir_fft_block(-0.2, 0.2, 0.05)
    n = 4 * blk.input_size
    x = cplx_noise(n, seed=7)
    st = blk.init()
    st, y = blk.apply(st, to_dev(x))
    kio = to_host(y)
    monkeypatch.delenv("CSDR_PALLAS_INTERPRET")
    st = blk.init()
    st, y2 = blk.apply(st, to_dev(x))
    assert_snr(to_host(y2), kio, 90, "fftfilt kernel vs fallback")


@pytest.mark.parametrize("env", [None, "1"])
def test_wide_taps_overlap_exceeds_input(monkeypatch, env):
    """transition_bw ~0.014 -> taps in (fft/2, fft-200]: overlap > input
    size and the tail cascades multiple frames — must still match direct
    convolution (both code paths)."""
    if env:
        if not interpret_is_exact():
            pytest.skip("interpret emulation is only f32-exact on CPU")
        monkeypatch.setenv("CSDR_PALLAS_INTERPRET", env)
    low, high, bw = -0.1, 0.2, 0.014
    blk = fftfilt.bandpass_fir_fft_block(low, high, bw)
    t = firdes.firdes_filter_len(bw)
    assert blk.overlap > blk.input_size        # the regime under test
    taps = firdes.firdes_bandpass_c(t, low, high).astype(np.complex128)
    n = 6 * blk.input_size
    x = cplx_noise(n, seed=11)
    st = blk.init()
    st, y1 = blk.apply(st, to_dev(x[: 3 * blk.input_size]))
    st, y2 = blk.apply(st, to_dev(x[3 * blk.input_size:]))
    ours = np.concatenate([to_host(y1), to_host(y2)])
    full = np.convolve(x, taps)[: n]
    assert_snr(full[t:], ours[t:], 85, "wide-taps bandpass vs direct conv")


def test_bandpass_retune_reaches_jitted_apply():
    """The taps spectra ride the state pytree: swapping them (the CLI FIFO
    retune) must change the output of an ALREADY-JITTED apply.  Pre-fix the
    taps were closure constants and the retune was a silent no-op."""
    import jax

    rng = np.random.default_rng(8)
    blk = fftfilt.bandpass_fir_fft_block(0.05, 0.15, 0.05)
    n = 4 * blk.input_size
    x = cplx.from_numpy((rng.standard_normal(n)
                         + 1j * rng.standard_normal(n)).astype(np.complex64))
    japply = jax.jit(blk.apply)
    st = blk.init()
    _, y_old = japply(st, x)
    # retune to a disjoint band through the SAME jitted callable
    tfft, tko = fftfilt.bandpass_taps_spectra(0.05, -0.4, -0.3)
    st2 = (st[0], tfft, tko if tko is not None else st[2])
    _, y_new = japply(st2, x)
    # reference: a freshly-built block at the new band
    blk2 = fftfilt.bandpass_fir_fft_block(-0.4, -0.3, 0.05)
    _, y_ref = blk2.apply(blk2.init(), x)
    old = cplx.to_numpy(y_old)
    new = cplx.to_numpy(y_new)
    ref = cplx.to_numpy(y_ref)
    assert not np.allclose(new, old, atol=1e-5), "retune was a no-op"
    np.testing.assert_allclose(new.real, ref.real, atol=1e-4)
    np.testing.assert_allclose(new.imag, ref.imag, atol=1e-4)
