"""Golden tests: filter design vs the reference C implementation."""

import numpy as np
import pytest

from csdr_tpu import firdes
from tests.util import refbind, assert_snr


@pytest.mark.parametrize("length,cutoff", [(81, 0.05), (199, 0.01), (21, 0.25)])
@pytest.mark.parametrize("window,wref", [
    (firdes.HAMMING, refbind.WINDOW_HAMMING),
    (firdes.BLACKMAN, refbind.WINDOW_BLACKMAN),
    (firdes.BOXCAR, refbind.WINDOW_BOXCAR),
])
def test_lowpass_matches_reference(length, cutoff, window, wref):
    ours = firdes.firdes_lowpass_f(length, cutoff, window)
    ref = refbind.firdes_lowpass_f(length, cutoff, wref)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=2e-7)


@pytest.mark.parametrize("length,lo,hi", [(101, -0.2, 0.1), (257, 0.0, 0.25)])
def test_bandpass_matches_reference(length, lo, hi):
    ours = firdes.firdes_bandpass_c(length, lo, hi)
    ref = refbind.firdes_bandpass_c(length, lo, hi)
    # the reference accumulates the tap phase in float32 with per-step wrap
    # (libcsdr.c:157-161); our float64 closed form differs at ~-108 dB
    assert_snr(ref, ours, 100, "bandpass taps")


def test_filter_len():
    # the C computes 4.0/float(bw): float32(0.05) > 0.05, so 4/0.05f
    # truncates to 79 (not 80->81) — matches the reference binary
    assert firdes.firdes_filter_len(0.05) == 79
    assert firdes.firdes_filter_len(0.1) == 39
    assert firdes.firdes_filter_len(0.0123) == 325


def test_lowpass_dc_gain():
    taps = firdes.firdes_lowpass_f(81, 0.05)
    assert abs(taps.sum() - 1.0) < 1e-6
