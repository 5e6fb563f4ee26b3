"""Multi-chip fastddc channelizer bank: C channels x time sharded over a
2-D Mesh('chan', 'time') — BASELINE config 5 (the reference's 64-channel
ddcd fastddc mode, ddcd_old.h:59-61, re-designed for a device mesh).

Sharding plan (SURVEY.md §2.12 mapping 3):
- 'time': the wideband stream is sharded; the forward-FFT frame overlap
  (overlap_length = taps-1, fastddc.c:52) crosses shard boundaries via a
  ppermute halo — the collective form of the reference CLI's
  keep-overlap-then-fread (csdr.c:2291-2293).
- 'chan': per-channel tap spectra / fold permutations / NCO rates are
  sharded; the batched frequency-domain inverse (ops/fastddc.py) runs on
  the local channel rows only.
- The forward FFT is recomputed per chan-shard instead of broadcast:
  each shard FFTs its local time samples (already resident), which is far
  cheaper than moving fft_size spectra over ICI — compute is traded for
  bandwidth exactly where the roofline says to.

Post-decimation NCO phase uses exact float64 host ramps indexed by the
GLOBAL output position (same trick as sharded_wfm.py), so channel outputs
are bit-stable in the shard count: phase error never grows with stream
offset.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from csdr_tpu.core import cplx, fft as cfft
from csdr_tpu.core.cplx import CF
from csdr_tpu.ops import fastddc as fd
from csdr_tpu.parallel import halo as hx

TWO_PI = 2.0 * np.pi


def build_ddc_bank_step(mesh: Mesh, ddc: fd.FastDDC, shift_rates):
    """Returns (step, meta): step(x: CF wideband, sharded P('time')) ->
    (C, M) baseband sharded P('chan','time').

    Constraints (asserted at trace time): the per-time-shard sample count
    must be a multiple of input_size, and the per-shard inverse output
    (frames * post_input_size) a multiple of post_decimation, so every
    shard emits the same static count and global offsets line up.
    """
    rates = np.asarray(shift_rates, np.float64)
    c_total = len(rates)
    n_chan = mesh.shape["chan"]
    n_time = mesh.shape["time"]
    assert c_total % n_chan == 0, (c_total, n_chan)

    ov = ddc.overlap_length
    ins = ddc.input_size
    pis = ddc.post_input_size
    post = ddc.post_decimation
    fused = pis % post == 0

    if fused:
        # fused single-matmul inverse (ops/fastddc.channel_fused_matrix):
        # G stacked on a leading channel axis so 'chan' shards it
        cols = [fd.channel_fused_matrix(ddc, float(r)) for r in rates]
        fold_np = np.stack([g for g, _ in cols])              # (C, fft, M)
        cyc_np = np.asarray([fc for _, fc in cols], np.float64)  # /frame
    else:
        fold_np = np.stack([fd.channel_matrix(ddc, float(r)) for r in rates])
        cyc_np = np.asarray([fd.channel_arrays(ddc, float(r))[2]
                             for r in rates], np.float64)     # /taken sample

    ramp_cache: dict[int, tuple] = {}

    def _nco_tables(k_local: int):
        """Exact per-channel NCO ramps over one shard's k_local units
        (frames when fused, taken samples otherwise)."""
        if k_local not in ramp_cache:
            k = np.arange(k_local, dtype=np.float64)
            ramp = np.mod(k[None, :] * cyc_np[:, None], 1.0).astype(np.float32)
            c1 = np.mod(k_local * cyc_np, 1.0).astype(np.float32)
            # numpy, not jnp: jnp arrays created inside a trace leak tracers
            ramp_cache[k_local] = (ramp, c1)
        return ramp_cache[k_local]

    def shard_fn(x_re, x_im, f_re, f_im, ramp, c1):
        nl = x_re.shape[0]
        assert nl % ins == 0, f"shard samples {nl} % input_size {ins} != 0"
        b = nl // ins
        assert (b * pis) % post == 0, (b, pis, post)
        halo = hx.halo_from_left(CF(x_re, x_im), ov, "time")
        frames = fd.overlap_frames(CF(x_re, x_im), halo, ins, ov)  # (B_l, fft)
        spectra = cfft.fft(frames)
        cl = f_re.shape[0]                                # local channels
        tidx_f = jax.lax.axis_index("time").astype(jnp.float32)
        cycles = (tidx_f * c1[:, None] + ramp) % 1.0
        rot = cplx.expj(TWO_PI * cycles)
        if fused:
            m = pis // post
            g = CF(f_re.transpose(1, 0, 2).reshape(ddc.fft_size, cl * m),
                   f_im.transpose(1, 0, 2).reshape(ddc.fft_size, cl * m))
            dot = lambda a, mm: jnp.dot(a, mm,
                                        precision=jax.lax.Precision.HIGH,
                                        preferred_element_type=jnp.float32)
            zr = dot(spectra.re, g.re) - dot(spectra.im, g.im)  # (B_l, Cl*M)
            zi = dot(spectra.re, g.im) + dot(spectra.im, g.re)
            zr = zr.reshape(b, cl, m).transpose(1, 0, 2)        # (Cl, B_l, M)
            zi = zi.reshape(b, cl, m).transpose(1, 0, 2)
            # rot: per-frame NCO (Cl, B_l)
            yr = zr * rot.re[:, :, None] - zi * rot.im[:, :, None]
            yi = zr * rot.im[:, :, None] + zi * rot.re[:, :, None]
            return yr.reshape(cl, b * m), yi.reshape(cl, b * m)
        fold_local = CF(f_re.transpose(1, 0, 2).reshape(ddc.fft_size, -1),
                        f_im.transpose(1, 0, 2).reshape(ddc.fft_size, -1))
        td = fd.fastddc_inv_batch_mxu(spectra, ddc, fold_local)
        flat = CF(td.re.transpose(1, 0, 2).reshape(cl, b * pis),
                  td.im.transpose(1, 0, 2).reshape(cl, b * pis))
        taken = CF(flat.re[:, ::post], flat.im[:, ::post])    # (C_l, m)
        y = taken * rot                                       # per-sample NCO
        return y.re, y.im

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("time"), P("time"),
                  P("chan", None, None), P("chan", None, None),
                  P("chan", None), P("chan")),
        out_specs=(P("chan", "time"), P("chan", "time")),
        check_vma=False)

    fold_eff = CF(jnp.asarray(fold_np.real), jnp.asarray(fold_np.imag))

    # the fold matrices are explicit jit ARGUMENTS (device-resident, no
    # per-call transfer): closing over them would ship them as program
    # constants, which breaks remote compilation at large C*inv
    @jax.jit
    def _step(x_re, x_im, f_re, f_im, ramp, c1):
        return fn(x_re, x_im, f_re, f_im, ramp, c1)

    def step(x: CF):
        nl = x.shape[0] // n_time
        b_local = nl // ins
        k_local = b_local if fused else b_local * pis // post
        ramp, c1 = _nco_tables(k_local)
        yr, yi = _step(x.re, x.im, fold_eff.re, fold_eff.im, ramp, c1)
        return CF(yr, yi)

    meta = dict(input_size=ins, overlap=ov, post_input=pis, post=post,
                channels=c_total)
    return step, meta


def example_ddc_bank(mesh: Mesh, frames_per_shard: int = 4,
                     c_total: int = 8, decimation: int = 16,
                     transition_bw: float = 0.05):
    """Build a bank + example input for compile checks / dryrun."""
    ddc = fd.fastddc_init(transition_bw, decimation)
    rng = np.random.default_rng(1)
    rates = rng.uniform(-0.4, 0.4, c_total)
    step, meta = build_ddc_bank_step(mesh, ddc, rates)
    n = mesh.shape["time"] * frames_per_shard * ddc.input_size
    x = CF(jnp.asarray(rng.standard_normal(n), jnp.float32),
           jnp.asarray(rng.standard_normal(n), jnp.float32))
    return step, x, ddc, rates
