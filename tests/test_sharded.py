"""Multi-chip sharding tests on the virtual 8-device CPU mesh: the sharded
WFM bank must match the single-device computation exactly (bit-stable halo
math, SURVEY.md §7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from csdr_tpu.core.cplx import CF
from csdr_tpu.parallel import sharded_wfm
from tests.util import assert_snr


def _mesh(chan, time):
    devs = np.array(jax.devices()[: chan * time]).reshape(chan, time)
    return Mesh(devs, ("chan", "time"))


@pytest.mark.parametrize("chan,time", [(1, 8), (2, 4), (4, 2), (8, 1)])
def test_wfm_bank_mesh_shape_invariance(chan, time):
    """Same input, different mesh factorizations -> identical audio."""
    n = 8 * 12800  # divisible by 8 shards * d1*d2=50
    step1, x = sharded_wfm.example_bank(_mesh(chan, time), n)
    ref_step, _ = sharded_wfm.example_bank(_mesh(8, 1), n)
    a = np.asarray(jax.block_until_ready(step1(x)))
    b = np.asarray(jax.block_until_ready(ref_step(x)))
    assert a.shape == b.shape
    # different time-shard counts round the NCO phase base differently
    # (frac(tidx*Nl*rate) in f32); the FM discriminator's division amplifies
    # that on near-zero-envelope samples, so acceptance is SNR-based
    assert_snr(b, a, 80, f"mesh {chan}x{time}")
    np.testing.assert_allclose(a, b, atol=5e-3)


def test_wfm_bank_time_sharding_matches_single_device():
    """time=8 sharding vs chan-only sharding: halo + scan fixup must
    reproduce the unsharded stream math to float tolerance."""
    n = 8 * 6400
    mesh_t = _mesh(1, 8)
    mesh_c = _mesh(8, 1)
    step_t, x = sharded_wfm.example_bank(mesh_t, n)
    step_c, _ = sharded_wfm.example_bank(mesh_c, n)
    a = np.asarray(jax.block_until_ready(step_t(x)))
    b = np.asarray(jax.block_until_ready(step_c(x)))
    assert_snr(b, a, 90, "time-shard vs chan-shard")


# ---------------------------------------------------------------------------
# fastddc channelizer bank (BASELINE config 5)
# ---------------------------------------------------------------------------

def test_ddc_bank_matches_single_device_inverse():
    """Sharded channelizer == unsharded fastddc_inv_block on one block."""
    from csdr_tpu.ops import fastddc as fd
    from csdr_tpu.parallel import sharded_ddc

    mesh = _mesh(2, 4)
    step, x, ddc, rates = sharded_ddc.example_ddc_bank(mesh, frames_per_shard=4,
                                                       c_total=8, decimation=16)
    out = np.asarray(jax.block_until_ready(step(x)).re) + \
        1j * np.asarray(step(x).im)

    fwd = fd.fastddc_fwd_block(ddc)
    inv = fd.fastddc_inv_block(ddc, rates)
    sf, spectra = fwd.apply(fwd.init(), x)
    si, vo = inv.apply(inv.init(), spectra)
    counts = np.asarray(vo.count)
    ref = np.asarray(vo.data.re) + 1j * np.asarray(vo.data.im)
    m = out.shape[1]
    for c in range(8):
        n = min(int(counts[c]), m)
        np.testing.assert_allclose(out[c, :n].real, ref[c, :n].real,
                                   atol=2e-4)
        np.testing.assert_allclose(out[c, :n].imag, ref[c, :n].imag,
                                   atol=2e-4)


@pytest.mark.parametrize("chan,time", [(1, 8), (4, 2), (8, 1)])
def test_ddc_bank_mesh_shape_invariance(chan, time):
    from csdr_tpu.parallel import sharded_ddc

    # fixed global block: 8 * 4 frames worth of input
    frames_total = 8 * 2
    step_a, x, ddc, rates = sharded_ddc.example_ddc_bank(
        _mesh(chan, time), frames_per_shard=frames_total // time, c_total=8)
    step_b, _, _, _ = sharded_ddc.example_ddc_bank(
        _mesh(8, 1), frames_per_shard=frames_total, c_total=8)
    a = jax.block_until_ready(step_a(x))
    b = jax.block_until_ready(step_b(x))
    np.testing.assert_allclose(np.asarray(a.re), np.asarray(b.re), atol=2e-4)
    np.testing.assert_allclose(np.asarray(a.im), np.asarray(b.im), atol=2e-4)


def test_ddc_bank_classed_decimation_matches_single_device():
    """D=50: the sharded bank's phase-classed branch == unsharded classed
    inverse (q-aligned shards, ppermute halo, carried NCO)."""
    from csdr_tpu.ops import fastddc as fd
    from csdr_tpu.parallel import sharded_ddc

    mesh = _mesh(2, 4)
    step, x, ddc, rates = sharded_ddc.example_ddc_bank(
        mesh, frames_per_shard=25, c_total=4, decimation=50)
    out = step(x)
    out_c = np.asarray(out.re) + 1j * np.asarray(out.im)

    fwd = fd.fastddc_fwd_block(ddc)
    inv = fd.fastddc_inv_block(ddc, rates)
    _, spectra = fwd.apply(fwd.init(), x)
    _, vo = inv.apply(inv.init(), spectra)
    counts = np.asarray(vo.count)
    ref = np.asarray(vo.data.re) + 1j * np.asarray(vo.data.im)
    m = out_c.shape[1]
    for c in range(4):
        n = min(int(counts[c]), m)
        np.testing.assert_allclose(out_c[c, :n].real, ref[c, :n].real,
                                   atol=2e-4)
        np.testing.assert_allclose(out_c[c, :n].imag, ref[c, :n].imag,
                                   atol=2e-4)
