"""Exact pipeline warmup accounting (VERDICT r1 weak #4 / next #8):
Pipeline.warmup_out converts each block's warmup through downstream rate
ratios, and raises (instead of silently guessing) when a data-dependent-
rate block sits downstream of pending warmup."""

import jax.numpy as jnp
import numpy as np
import pytest

from csdr_tpu import firdes
from csdr_tpu.core.block import Pipeline, stateless
from csdr_tpu.ops import fir, resamp


def test_warmup_exact_through_decimator():
    taps = jnp.asarray(firdes.firdes_lowpass_f(81, 0.05))
    dec = fir.fir_decimate_block(taps, 10)
    assert dec.warmup_out == -(-(81 - 1) // 10)   # ceil((T-1)/D)
    # gain stage after: same warmup at the output rate
    p = Pipeline([dec, stateless("g", lambda x: x * 2.0)])
    assert p.warmup_out == dec.warmup_out
    # decimator AFTER a warmup-carrying stage: upstream warmup scales by 1/D
    t2 = jnp.asarray(firdes.firdes_lowpass_f(41, 0.2))
    fir1 = fir.fir_decimate_block(t2, 1, name="fir1")       # plain FIR, D=1
    p2 = Pipeline([fir1, dec])
    assert p2.warmup_out == -(-(fir1.warmup_out // 1) // 10) + dec.warmup_out


def test_warmup_interpolator_scaling():
    taps = jnp.asarray(firdes.firdes_lowpass_f(41, 0.1))
    interp = fir.fir_interpolate_block(taps, 4)
    pre = fir.fir_decimate_block(taps, 1, name="pre")
    p = Pipeline([pre, interp])
    assert p.warmup_out == pre.warmup_out * 4 + interp.warmup_out


def test_warmup_raises_on_variable_rate_downstream():
    taps = jnp.asarray(firdes.firdes_lowpass_f(81, 0.05))
    dec = fir.fir_decimate_block(taps, 10)
    frac = resamp.fractional_decimator_block(5.0)
    p = Pipeline([dec, frac])
    with pytest.raises(ValueError, match="data-dependent rate"):
        _ = p.warmup_out
    # with no pending warmup, a variable-rate block is fine
    p2 = Pipeline([frac, stateless("g", lambda x: x)])
    assert p2.warmup_out == 0


def test_stream_runner_uses_exact_warmup():
    from csdr_tpu.core.stream import run_offline
    taps = jnp.asarray(firdes.firdes_lowpass_f(81, 0.05))
    dec = fir.fir_decimate_block(taps, 10)
    p = Pipeline([dec, stateless("g", lambda x: x * 1.0)])
    from csdr_tpu.core.cplx import CF
    rng = np.random.default_rng(0)
    z = (rng.standard_normal(40000) + 1j * rng.standard_normal(40000)
         ).astype(np.complex64)
    full = run_offline(p, z, block_size=10000)
    trimmed = run_offline(p, z, block_size=10000, drop_warmup=True)
    assert len(full) - len(trimmed) == p.warmup_out
    np.testing.assert_array_equal(full[p.warmup_out:], trimmed)
