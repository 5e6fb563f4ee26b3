"""Golden tests: FIR decimator/interpolator/resampler vs the reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from csdr_tpu import firdes
from csdr_tpu.ops import fir
from tests.util import refbind, assert_snr, cplx_noise, real_noise, to_dev, to_host


@pytest.mark.parametrize("d,bw", [(10, 0.05), (50, 0.05), (3, 0.1)])
def test_fir_decimate_stateless_matches_reference(d, bw):
    taps = firdes.firdes_lowpass_f(firdes.firdes_filter_len(bw), 0.5 / d)
    x = cplx_noise(8192)
    ref = refbind.fir_decimate_cc(x, taps, d)
    ours = to_host(fir.fir_decimate_cc(to_dev(x), jnp.asarray(taps), d))
    assert ours.shape == ref.shape
    assert_snr(ref, ours, 100, f"fir_decimate D={d}")


@pytest.mark.parametrize("d", [10, 50])
def test_fir_decimate_streaming_matches_valid(d):
    """Streaming block over chunks == valid-mode over the stream after
    dropping warmup outputs."""
    taps = firdes.firdes_lowpass_f(81, 0.5 / d)
    n_chunk = 1000 * d
    x = cplx_noise(4 * n_chunk, seed=2)
    blk = fir.fir_decimate_block(taps, d, use_pallas=False)
    st = blk.init()
    outs = []
    for c in range(4):
        st, y = blk.apply(st, to_dev(x[c * n_chunk:(c + 1) * n_chunk]))
        outs.append(to_host(y))
    streamed = np.concatenate(outs)[blk.warmup_out:]
    ref = refbind.fir_decimate_cc(x, taps, d)
    m = min(len(streamed), len(ref))
    assert m > 0
    assert_snr(ref[:m], streamed[:m], 100, f"streamed decimate D={d}")


@pytest.mark.parametrize("i", [2, 5])
def test_fir_interpolate_matches_reference(i):
    taps = firdes.firdes_lowpass_f(41, 0.5 / i)
    x = cplx_noise(2048, seed=7)
    ref = refbind.fir_interpolate_cc(x, taps, i)
    ours = to_host(fir.fir_interpolate_cc(to_dev(x), taps, i))
    m = min(len(ref), len(ours))
    assert m > len(x) // 2 * i
    assert_snr(ref[:m], ours[:m], 95, f"interp I={i}")


@pytest.mark.parametrize("i,d", [(3, 2), (5, 4), (2, 3)])
def test_rational_resampler_matches_reference(i, d):
    taps = firdes.rational_resampler_get_lowpass_f(121, i, d)
    x = real_noise(4096, seed=11)
    ref, in_proc, ltd = refbind.rational_resampler_ff(x, taps, i, d)
    y, count, in_proc2, ltd2 = fir.rational_resampler_ff(jnp.asarray(x), jnp.asarray(taps), i, d)
    ours = np.asarray(y)[: int(count)]
    m = min(len(ref), len(ours))
    assert m > 0
    assert_snr(ref[:m], ours[:m], 95, f"resampler {i}/{d}")
    assert int(count) == len(ref)
    assert int(in_proc2) == in_proc
    assert int(ltd2) == ltd


def test_apply_fir_cc_complex_taps():
    taps = firdes.firdes_bandpass_c(31, -0.1, 0.2)
    x = cplx_noise(512, seed=13)
    ours = to_host(fir.apply_fir_cc(to_dev(x), to_dev(taps)))
    # straightforward numpy model
    ref = np.array([np.sum(x[i:i + 31] * taps) for i in range(len(x) - 30)])
    assert_snr(ref, ours, 95, "apply_fir_cc")


@pytest.mark.parametrize("n,t", [(2000, 53), (300, 17), (2000, 12), (90, 40)])
def test_apply_real_fir_ff_toeplitz_matches_frames(n, t):
    # the stride-1 Toeplitz tile path (t >= 16, k >= 128) and the frames
    # fallback must agree with the direct model across both regimes
    x = real_noise(n, seed=7)
    taps = real_noise(t, seed=8)
    ours = to_host(fir.apply_real_fir_ff(to_dev(x), to_dev(taps)))
    k = n - t + 1
    ref = np.array([x[i:i + t] @ taps for i in range(k)])
    assert ours.shape == (k,)
    assert_snr(ref, ours, 110, f"apply_real_fir_ff n={n} t={t}")


def test_apply_fir_cc_toeplitz_long_taps():
    # k >= 128 and t >= 16 engages the Toeplitz tile path for complex taps
    taps = firdes.firdes_bandpass_c(63, -0.15, 0.25)
    x = cplx_noise(1500, seed=21)
    ours = to_host(fir.apply_fir_cc(to_dev(x), to_dev(taps)))
    ref = np.array([np.sum(x[i:i + 63] * taps) for i in range(len(x) - 62)])
    assert_snr(ref, ours, 95, "apply_fir_cc toeplitz")


def test_apply_real_fir_cc_toeplitz_long_taps():
    taps = real_noise(53, seed=22)
    x = cplx_noise(1200, seed=23)
    ours = to_host(fir.apply_real_fir_cc(to_dev(x), to_dev(taps)))
    ref = np.array([np.sum(x[i:i + 53] * taps) for i in range(len(x) - 52)])
    assert_snr(ref, ours, 95, "apply_real_fir_cc toeplitz")
