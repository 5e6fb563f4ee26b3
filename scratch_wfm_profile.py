"""Scratch: per-stage on-chip profile of the WFM advanced chain.

Which back-end stage (fmdemod / fractional_decimator / deemph) eats the
~2/3 of wfm_advanced's per-call time that the 53-Gsps FIR front end does
not account for?  (Arithmetic from BENCHMARKS_R3: 11.5 Gsps end-to-end vs
~29 us/2.4M front end => back end ~1.7 Gsps effective at the 240k rate.)
"""
import numpy as np
import jax
import jax.numpy as jnp

from csdr_tpu.core import cplx
from csdr_tpu.core.block import Pipeline
from csdr_tpu.models import wfm
from csdr_tpu.ops import demod, fir, resamp, shift
from csdr_tpu import firdes
from csdr_tpu.utils.timing import time_kernel

rng = np.random.default_rng(0)
N = 2_400_000
x = cplx.from_numpy((rng.standard_normal(N) +
                     1j * rng.standard_normal(N)).astype(np.complex64))
n2 = N // 10
x2 = cplx.from_numpy((rng.standard_normal(n2) +
                      1j * rng.standard_normal(n2)).astype(np.complex64))
f2 = jnp.asarray(rng.standard_normal(n2).astype(np.float32))
n3 = N // 50
f3 = jnp.asarray(rng.standard_normal(n3).astype(np.float32))

rows = []

def stage(name, pipe, xin, k_pair):
    st = pipe.init()
    def kfn(xi):
        out = pipe.apply(st, xi)[1]
        return out.data if hasattr(out, "data") else out
    per = time_kernel(kfn, xin, k_pair=k_pair)
    rows.append((name, per * 1e6))
    print(f"{name:34s} {per*1e6:9.1f} us/call", flush=True)

taps = firdes.firdes_lowpass_f(firdes.firdes_filter_len(0.05), 0.05,
                               firdes.HAMMING)

stage("full wfm_advanced (2.4M)", wfm.wfm_advanced(shift_rate=-0.2), x,
      (64, 512))
stage("front shift+fir (2.4M)", Pipeline([
    shift.shift_block(-0.2),
    fir.fir_decimate_block(taps, 10, use_pallas=True)], name="front"), x,
    (64, 512))
stage("back fmdemod+frac+deemph (240k)", Pipeline([
    demod.fmdemod_quadri_block(),
    resamp.fractional_decimator_block(5.0),
    demod.deemphasis_wfm_block(50e-6, 48_000)], name="back"), x2,
    (128, 1024))
stage("fmdemod alone (240k)", Pipeline([
    demod.fmdemod_quadri_block()], name="fm"), x2, (256, 2048))

frac = resamp.fractional_decimator_block(5.0)
stf = frac.apply(frac.init(), f2)[0]
per = time_kernel(lambda xi: frac.apply(stf, xi)[1].data, f2,
                  k_pair=(256, 2048))
rows.append(("frac 5.0 alone (240k f32)", per * 1e6))
print(f"{'frac 5.0 alone (240k f32)':34s} {per*1e6:9.1f} us/call", flush=True)

de = demod.deemphasis_wfm_block(50e-6, 48_000)
std = de.init()
per = time_kernel(lambda xi: de.apply(std, xi)[1], f3, k_pair=(256, 4096))
rows.append(("deemph alone (48k f32)", per * 1e6))
print(f"{'deemph alone (48k f32)':34s} {per*1e6:9.1f} us/call", flush=True)

print("\nsummary:")
for name, us in rows:
    print(f"  {name:34s} {us:9.1f} us")
