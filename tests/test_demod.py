"""Golden tests: demodulators / de-emphasis / DC blockers vs reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from csdr_tpu.ops import demod, util_ops
from tests.util import refbind, assert_snr, cplx_noise, real_noise, to_dev, to_host


def _fm_signal(n=8192, seed=0):
    """A synthetic FM baseband: NCO modulated by low-freq audio."""
    rng = np.random.default_rng(seed)
    audio = np.cumsum(rng.standard_normal(n)) * 0.001
    phase = np.cumsum(0.1 + 0.05 * np.sin(audio))
    return np.exp(1j * 2 * np.pi * phase).astype(np.complex64)


def test_fmdemod_quadri_matches_reference():
    x = _fm_signal()
    ref = refbind.fmdemod_quadri_cf(x)
    ours, _ = demod.fmdemod_quadri_cf(to_dev(x))
    assert_snr(ref, np.asarray(ours), 90, "fmdemod_quadri")


def test_fmdemod_atan_matches_reference():
    x = _fm_signal(seed=1)
    ref, _ = refbind.fmdemod_atan_cf(x)
    ours, _ = demod.fmdemod_atan_cf(to_dev(x))
    assert_snr(ref, np.asarray(ours), 80, "fmdemod_atan")


def test_amdemod():
    x = cplx_noise(2048, seed=2)
    ref = refbind.amdemod_cf(x)
    ours = np.asarray(demod.amdemod_cf(to_dev(x)))
    assert_snr(ref, ours, 100, "amdemod")


def test_deemphasis_wfm_matches_reference():
    x = real_noise(8192, seed=3)
    ref = refbind.deemphasis_wfm_ff(x, 75e-6, 48000)
    ours, _ = demod.deemphasis_wfm_ff(jnp.asarray(x), 75e-6, 48000)
    assert_snr(ref, np.asarray(ours), 90, "deemphasis_wfm")


def test_deemphasis_streaming_carry():
    x = real_noise(8192, seed=4)
    one, _ = demod.deemphasis_wfm_ff(jnp.asarray(x), 50e-6, 48000)
    blk = demod.deemphasis_wfm_block(50e-6, 48000)
    st = blk.init()
    st, y1 = blk.apply(st, jnp.asarray(x[:4096]))
    st, y2 = blk.apply(st, jnp.asarray(x[4096:]))
    two = np.concatenate([np.asarray(y1), np.asarray(y2)])
    assert_snr(np.asarray(one), two, 110, "deemph carry")


def test_dcblock_matches_reference():
    x = real_noise(4096, seed=5) + 0.3  # with DC offset
    ref, _ = refbind.dcblock_ff(x)
    ours, _ = util_ops.dcblock_ff(jnp.asarray(x))
    assert_snr(ref, np.asarray(ours), 80, "dcblock")


def test_fastdcblock_matches_reference():
    x = real_noise(4096, seed=6) + 0.5
    ref, avg_ref = refbind.fastdcblock_ff(x)
    ours, avg = util_ops.fastdcblock_ff(jnp.asarray(x))
    assert_snr(ref, np.asarray(ours), 90, "fastdcblock")
    assert abs(float(avg) - avg_ref) < 1e-5


def test_deemphasis_wfm_fir_form_edges():
    """The truncated-FIR de-emphasis must (a) match the affine scan at
    normal alphas across chunk boundaries and (b) keep a fixed-size state
    at extreme alphas (kf floor of 2: a 0-length tail slice would return
    the whole array and grow the carry)."""
    import jax.numpy as jnp
    from csdr_tpu.ops import demod
    x = jnp.asarray(np.random.default_rng(0).standard_normal(1000),
                    jnp.float32)
    blk = demod.deemphasis_wfm_block(1e-9, 48000)   # alpha ~ 1 -> kf == 2
    st = blk.init()
    for _ in range(3):
        st, y = blk.apply(st, x)
        assert st.shape == (1,)
        assert y.shape == (1000,)
    blk2 = demod.deemphasis_wfm_block(50e-6, 48000)
    s2 = blk2.init()
    ys = []
    for _ in range(2):
        s2, y = blk2.apply(s2, x)
        ys.append(np.asarray(y))
    ref, _ = demod.deemphasis_wfm_ff(jnp.concatenate([x, x]), 50e-6, 48000)
    assert np.abs(np.concatenate(ys) - np.asarray(ref)).max() < 1e-5
