"""On-chip A/B of time_kernel perturbation schemes (run when axon is live).

Hypothesis: the whole-array eps-add materializes a copy of x every
iteration (2 extra HBM passes/call for opaque pallas consumers), deflating
measured rates ~2x at the FIR headline shape.  The 'dus' scheme updates one
element of a loop-carried buffer in place (~4 bytes/iter).

Prints one JSON line per experiment.
"""
import json, sys
import numpy as np
import jax

def main():
    import jax.numpy as jnp
    from csdr_tpu import firdes
    from csdr_tpu.core.cplx import CF
    from csdr_tpu.kernels.fir_pallas import fir_decimate_best
    from csdr_tpu.utils.timing import time_kernel

    d, t, kout = 10, 1023, 512 * 128
    n = kout * d
    tail = max(((t - 1 + d - 1) // d) * d,
           (kout // 128 + 8) * 128 * d - n)  # vmem full need: no in-call pad
    taps = jnp.asarray(firdes.firdes_lowpass_f(t, 0.5 / d))
    rng = np.random.default_rng(0)
    x = CF(jnp.asarray(rng.standard_normal(n + tail).astype(np.float32)),
           jnp.asarray(rng.standard_normal(n + tail).astype(np.float32)))

    # 1) identity kernel: measures pure perturb+scalarize overhead per call
    ident = lambda x: x
    for mode in ("add", "dus", "rotate"):
        per = time_kernel(ident, x, k_pair=(512, 8192), perturb=mode)
        print(json.dumps({"exp": "identity", "perturb": mode,
                          "us_per_call": round(per * 1e6, 2),
                          "note": "x is 5.25MB; fused-read floor ~7us, "
                                  "materialized-copy ~21us"}), flush=True)

    # 2) the FIR headline kernel under the schemes
    prec = jax.lax.Precision.HIGH
    for mode in ("add", "dus", "rotate"):
        per = time_kernel(lambda x: fir_decimate_best(x, taps, d, kout, prec),
                          x, k_pair=(512, 8192), perturb=mode)
        print(json.dumps({"exp": "fir_decimate_HIGH", "perturb": mode,
                          "us_per_call": round(per * 1e6, 2),
                          "Msps": round(n / per / 1e6, 1)}), flush=True)

    # 3) correctness: dus-measured kernel output still golden vs XLA HIGHEST
    from csdr_tpu.ops.fir import fir_decimate_cc
    y = fir_decimate_best(x, taps, d, kout, prec)
    ref = fir_decimate_cc(x, taps, d, jax.lax.Precision.HIGHEST)[:kout]
    err = float(np.mean((np.asarray(jax.device_get(y.re)) - np.asarray(jax.device_get(ref.re)))**2
                        + (np.asarray(jax.device_get(y.im)) - np.asarray(jax.device_get(ref.im)))**2))
    pref = float(np.mean(np.asarray(jax.device_get(ref.re))**2 + np.asarray(jax.device_get(ref.im))**2))
    print(json.dumps({"exp": "golden_snr_db", "value": round(10*np.log10(pref/err), 1)}), flush=True)

if __name__ == "__main__":
    main()
