"""Golden tests: NCO shift vs reference shift_math_cc."""

import jax.numpy as jnp
import numpy as np
import pytest

from csdr_tpu.core.block import Pipeline
from csdr_tpu.ops import shift
from tests.util import refbind, assert_snr, cplx_noise, to_dev, to_host


@pytest.mark.parametrize("rate", [0.2, -0.05, 0.4999, 1e-4])
def test_shift_cc_matches_reference(rate):
    x = cplx_noise(4096)
    ref, _ = refbind.shift_math_cc(x, rate)
    ours, _ = shift.shift_cc(to_dev(x), rate)
    # the reference accumulates phase in float32 (drift grows with |rate|,
    # libcsdr.c:202-205); our NCO is float64-exact, so bound by ref's error
    assert_snr(ref, to_host(ours), 60, f"shift rate={rate}")


@pytest.mark.parametrize("rate", [0.2, -0.05, 0.4999, 1e-4])
def test_shift_cc_matches_float64_ideal(rate):
    x = cplx_noise(4096)
    n = np.arange(4096, dtype=np.float64)
    ideal = x * np.exp(1j * 2 * np.pi * np.mod(n * rate, 1.0))
    ours, _ = shift.shift_cc(to_dev(x), rate)
    assert_snr(ideal.astype(np.complex64), to_host(ours), 110,
               f"ideal NCO rate={rate}")


def test_shift_phase_carry():
    """Streaming in two chunks == one shot."""
    x = cplx_noise(8192, seed=3)
    one, _ = shift.shift_cc(to_dev(x), 0.123)
    b = shift.shift_block(0.123)
    st = b.init()
    st, y1 = b.apply(st, to_dev(x[:4096]))
    st, y2 = b.apply(st, to_dev(x[4096:]))
    two = np.concatenate([to_host(y1), to_host(y2)])
    assert_snr(to_host(one), two, 100, "phase carry")


def test_shift_dynamic_rate_matches_static():
    x = cplx_noise(1 << 16, seed=5)
    ys, _ = shift.shift_cc(to_dev(x), 0.1237)
    yd, _ = shift.shift_cc(to_dev(x), jnp.float32(0.1237))
    assert_snr(to_host(ys), to_host(yd), 60, "dynamic NCO")


def test_decimating_shift_against_reference_composition():
    """decimating_shift == shift(rate*D on decimated) . take-every-D."""
    x = cplx_noise(4000, seed=9)
    d = 4
    y, count, _, _ = shift.decimating_shift_cc(to_dev(x), 0.1, d)
    manual = x[::d]
    osc = np.exp(1j * 2 * np.pi * np.mod(np.arange(len(manual)) * 0.1, 1.0))
    assert int(count) == len(manual)
    assert_snr(manual * osc, to_host(y)[: int(count)], 90, "decimating shift")
