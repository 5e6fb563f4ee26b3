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


def build_fwd_only_step(mesh: Mesh, ddc: fd.FastDDC):
    """The chan-replicated part of the bank in isolation (framing + halo +
    forward FFT): used by bench_scaling's serializing-proxy correction —
    each chan-shard recomputes the forward by DESIGN (compute traded for
    ICI bandwidth, see module docstring), which runs CONCURRENTLY on real
    chips but serializes on a virtual 1-core mesh and would otherwise be
    mis-charged as partitioning overhead."""
    ov, ins = ddc.overlap_length, ddc.input_size

    def shard_fn(x_re, x_im):
        halo = hx.halo_from_left(CF(x_re, x_im), ov, "time")
        frames = fd.overlap_frames(CF(x_re, x_im), halo, ins, ov)
        spectra = fd.fwd_fft_frames(frames, "kernel")
        return spectra.re, spectra.im

    fn = jax.shard_map(shard_fn, mesh=mesh,
                       in_specs=(P("time"), P("time")),
                       out_specs=(P(("chan", "time")), P(("chan", "time"))),
                       check_vma=False)

    @jax.jit
    def step(x: CF):
        return fn(x.re, x.im)

    return step


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
        q, ga, g0_local, s_np, m_max = 1, pis // post, None, None, pis // post
        spec_axis = 1
    else:
        # phase-classed fused inverse (ops/fastddc._class_plan): per-class
        # matrices stacked (C, q, fft, m_max), compaction matrix S shared
        q, t0s, ms, m_max, s_np = fd._class_plan(ddc)
        ga = q * pis // post
        cols = [fd.channel_class_matrices(ddc, float(r)) for r in rates]
        fold_np = np.stack([g for g, _ in cols])          # (C, q, fft, mmax)
        dsa_np = np.asarray([d for _, d in cols], np.float64)
        cyc_np = None
        g0_local = np.asarray([(bb * pis + t0s[bb]) // post
                               for bb in range(q)], np.float64)
        spec_axis = 2
    # spectra ride in the matmul-FFT kernel's bin order (the digit reversal
    # folds into the spectral matrices; kernels/fft_pallas.py)
    from csdr_tpu.kernels.fft_pallas import kernel_perm
    fold_ko = np.empty_like(fold_np)
    idx = [slice(None)] * fold_np.ndim
    idx[spec_axis] = kernel_perm(ddc.fft_size)
    fold_ko[tuple(idx)] = fold_np
    fold_np = fold_ko

    ramp_cache: dict[int, tuple] = {}

    def _nco_tables(b_local: int):
        """Exact per-channel per-FRAME NCO ramps over one shard's b_local
        frames, plus the per-time-shard advance c1 (cycles).  cycles(frame
        b_global = tidx*b_local + b) = frac(tidx*c1 + ramp[b])."""
        if b_local not in ramp_cache:
            if fused:
                k = np.arange(b_local, dtype=np.float64)
                ramp = np.mod(k[None, :] * cyc_np[:, None], 1.0)
                c1 = np.mod(b_local * cyc_np, 1.0)
            else:
                assert b_local % q == 0, (b_local, q)
                k = np.arange(b_local)
                g0 = (k // q) * ga + g0_local[k % q]          # (B_l,) f64
                ramp = np.mod(g0[None, :] * dsa_np[:, None], 1.0)
                c1 = np.mod((b_local // q) * ga * dsa_np, 1.0)
            ramp_cache[b_local] = (ramp.astype(np.float32),
                                   c1.astype(np.float32))
        return ramp_cache[b_local]

    def shard_fn(x_re, x_im, f_re, f_im, ramp, c1):
        nl = x_re.shape[0]
        assert nl % ins == 0, f"shard samples {nl} % input_size {ins} != 0"
        b = nl // ins
        assert (b * pis) % post == 0, (b, pis, post)
        halo = hx.halo_from_left(CF(x_re, x_im), ov, "time")
        frames = fd.overlap_frames(CF(x_re, x_im), halo, ins, ov)  # (B_l, fft)
        spectra = fd.fwd_fft_frames(frames, "kernel")
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
        # phase-classed: (Cl, q, fft, mmax) -> per-class batched matmuls
        groups = b // q
        gre = f_re.transpose(1, 2, 0, 3).reshape(q, ddc.fft_size, cl * m_max)
        gim = f_im.transpose(1, 2, 0, 3).reshape(q, ddc.fft_size, cl * m_max)
        sr = spectra.re.reshape(groups, q, -1).transpose(1, 0, 2)
        si = spectra.im.reshape(groups, q, -1).transpose(1, 0, 2)
        dote = lambda a, mm: jnp.einsum(
            "qgf,qfm->qgm", a, mm, precision=jax.lax.Precision.HIGH,
            preferred_element_type=jnp.float32)
        zr = dote(sr, gre) - dote(si, gim)
        zi = dote(sr, gim) + dote(si, gre)
        zr = zr.reshape(q, groups, cl, m_max).transpose(2, 1, 0, 3)
        zi = zi.reshape(q, groups, cl, m_max).transpose(2, 1, 0, 3)
        rotf = CF(rot.re.reshape(cl, groups, q), rot.im.reshape(cl, groups, q))
        yr = zr * rotf.re[..., None] - zi * rotf.im[..., None]
        yi = zr * rotf.im[..., None] + zi * rotf.re[..., None]
        s_j = jnp.asarray(s_np)
        yr = jnp.einsum("ckm,mn->ckn", yr.reshape(cl, groups, q * m_max), s_j,
                        precision=jax.lax.Precision.HIGHEST)
        yi = jnp.einsum("ckm,mn->ckn", yi.reshape(cl, groups, q * m_max), s_j,
                        precision=jax.lax.Precision.HIGHEST)
        return yr.reshape(cl, groups * ga), yi.reshape(cl, groups * ga)

    fold_spec = P("chan", *([None] * (fold_np.ndim - 1)))
    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("time"), P("time"), fold_spec, fold_spec,
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
        ramp, c1 = _nco_tables(b_local)
        yr, yi = _step(x.re, x.im, fold_eff.re, fold_eff.im, ramp, c1)
        return CF(yr, yi)

    meta = dict(input_size=ins, overlap=ov, post_input=pis, post=post,
                channels=c_total, q=q, group_out=ga)
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
