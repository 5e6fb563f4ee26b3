"""Multi-chip WFM receiver bank: channel x time sharded over a 2-D mesh.

The flagship multi-chip configuration (SURVEY.md §7 step 7, BASELINE
"scaling" metric): a bank of C independent FM channels (each its own NCO
shift of the shared wideband stream — the ddcd per-client model of
ddcd_old.h:51-57 re-expressed as a batch axis) processed over a
Mesh('chan', 'time'):

- 'time': the sample stream is sharded; FIR history crosses shard
  boundaries via ppermute halo (parallel/halo.py) and the de-emphasis IIR
  carry is fixed up with a device-axis parallel scan — the collective form
  of the reference CLI's memmove-overlap + carried state.
- 'chan': channels are embarrassingly parallel (vmap inside the shard).

The chain per channel: shift -> fir_decimate(D1) -> fmdemod_quadri ->
decimate-by-D2 (integer-rate fractional decimator: at integer rates the
reference's Lagrange interpolator reduces to exact subsampling) ->
deemphasis_wfm.  Input: wideband CF block, replicated over 'chan',
sharded over 'time'.  Output: (C, N/(D1*D2)) audio, sharded over both.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from csdr_tpu.core.cplx import CF
from csdr_tpu.ops.demod import FMDEMOD_QUADRI_K
from csdr_tpu.parallel import halo as hx

TWO_PI = 2.0 * np.pi


def build_wfm_bank_step(mesh: Mesh, chan_rates: np.ndarray, taps: np.ndarray,
                        d1: int = 10, d2: int = 5, tau: float = 50e-6,
                        audio_rate: int = 48_000):
    """Returns a jittable step(x: CF sharded P('time')) -> audio (C, Nout)
    sharded P('chan','time').  chan_rates length must divide over the 'chan'
    axis; the block length over the 'time' axis with shards divisible by
    d1*d2."""
    taps = np.asarray(taps, np.float32)
    t_len = len(taps)
    tail = ((t_len - 1 + d1 - 1) // d1) * d1          # round_up(T-1, D1)
    from csdr_tpu.kernels.fir_pallas import _toeplitz_w
    toep_w = _toeplitz_w(taps, d1, 128)               # host/static
    n_time = mesh.shape["time"]
    n_chan = mesh.shape["chan"]
    c_total = len(chan_rates)
    assert c_total % n_chan == 0
    alpha = (1.0 / audio_rate) / (tau + 1.0 / audio_rate)

    rates_j = jnp.asarray(np.asarray(chan_rates, np.float32))

    def chain_one_channel(ramp, c1, c2, tidx_f, xre, xi_, nl):
        """ramp: (n_ext,) = frac(k*rate) precomputed in f64; c1 = frac(Nl*rate),
        c2 = frac(-tail_ext*rate) — so this shard's NCO phase is
        2*pi*((tidx*c1 + c2 + ramp) mod 1), exact to f32 rounding regardless
        of the global stream position (no f32 phase blowup at shard offsets).
        Returns audio (nl // (d1*d2),)."""
        base = (tidx_f * c1 + c2) % 1.0
        cycles = (base + ramp) % 1.0
        ph = TWO_PI * cycles
        c, s = jnp.cos(ph), jnp.sin(ph)
        yre = xre * c - xi_ * s
        yim = xre * s + xi_ * c
        # decimating FIR (valid): first nl//d1 + 1 outputs (one extra for
        # demod halo).  Toeplitz MXU matmul — a vmapped strided conv lowers
        # ~50x slower on this backend (see kernels/fir_pallas.py)
        from csdr_tpu.kernels.fir_pallas import _fir_decimate_toeplitz
        k1 = nl // d1 + 1
        k1p = -(-k1 // 128) * 128
        br, bi = _fir_decimate_toeplitz(yre, yim, toep_w, d1, k1p)
        br, bi = br[:k1], bi[:k1]
        # quadri demod across the extra leading sample
        di = br[1:] - br[:-1]
        dq = bi[1:] - bi[:-1]
        den = br[1:] * br[1:] + bi[1:] * bi[1:]
        dem = jnp.where(den != 0, FMDEMOD_QUADRI_K * (br[1:] * dq - bi[1:] * di) / den, 0.0)
        # integer-rate decimate (reference fractional_decimator at integer
        # rate == exact subsample)
        audio_in = dem[::d2]
        return audio_in

    tail_ext = tail + d1  # extra d1 samples so the demod has its previous output sample

    ramp_cache = {}

    def _nco_tables(nl: int):
        """Per-channel exact NCO constants, float64 on host (see shift.py)."""
        if nl not in ramp_cache:
            n_ext = tail_ext + nl
            k = np.arange(n_ext, dtype=np.float64)
            r = np.asarray(chan_rates, np.float64)[:, None]
            ramp = np.mod(k[None, :] * r, 1.0).astype(np.float32)        # (C, n_ext)
            c1 = np.mod(nl * r[:, 0], 1.0).astype(np.float32)            # (C,)
            c2 = np.mod(-tail_ext * r[:, 0], 1.0).astype(np.float32)     # (C,)
            # cache NUMPY (safe as trace constants); jnp arrays created
            # inside a trace would leak tracers on re-trace
            ramp_cache[nl] = (ramp, c1, c2)
        return ramp_cache[nl]

    def shard_fn(x_re, x_im, ramp_l, c1_l, c2_l):
        nl = x_re.shape[0]
        # halo: tail_ext samples from left neighbor (zeros on shard 0)
        hr = hx.halo_from_left(x_re, tail_ext, "time")
        hi_ = hx.halo_from_left(x_im, tail_ext, "time")
        xcat_re = jnp.concatenate([hr, x_re])
        xcat_im = jnp.concatenate([hi_, x_im])
        tidx_f = jax.lax.axis_index("time").astype(jnp.float32)
        dem = jax.vmap(lambda rmp, c1, c2: chain_one_channel(
            rmp, c1, c2, tidx_f, xcat_re, xcat_im, nl))(
                ramp_l, c1_l, c2_l)  # (Cl, nl/(d1*d2))
        # de-emphasis: local associative scan + cross-device affine fixup
        n_au = dem.shape[1]
        b = jnp.full((n_au,), 1.0 - alpha, jnp.float32)
        a = alpha * dem

        def comb(l, r):
            bl, al = l
            br_, ar = r
            return bl * br_, al * br_ + ar

        cb, ca = jax.lax.associative_scan(comb, (jnp.broadcast_to(b, a.shape), a), axis=1)
        carry_in = jax.vmap(
            lambda bt, at: hx.affine_scan_fixup(bt, at, 0.0, "time")
        )(cb[:, -1], ca[:, -1])
        audio = cb * carry_in[:, None] + ca
        return audio

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("time"), P("time"), P("chan", None), P("chan"), P("chan")),
        out_specs=P("chan", "time"),
        check_vma=False)

    @jax.jit
    def step(x: CF):
        ramp, c1, c2 = _nco_tables(x.shape[0] // n_time)
        return fn(x.re, x.im, ramp, c1, c2)

    return step


def example_bank(mesh: Mesh, n_block: int, c_total: int = 8):
    """Convenience: build a step + example input for compile checks."""
    from csdr_tpu import firdes

    rng = np.random.default_rng(0)
    rates = (rng.uniform(-0.4, 0.4, c_total)).astype(np.float32)
    taps = firdes.firdes_lowpass_f(81, 0.05)
    step = build_wfm_bank_step(mesh, rates, taps)
    x = CF(jnp.asarray(rng.standard_normal(n_block), jnp.float32),
           jnp.asarray(rng.standard_normal(n_block), jnp.float32))
    return step, x
