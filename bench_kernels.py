"""test200-equivalent kernel timing harness (reference test200.c:42-124):
time fir_decimate_cc (D=10, 1023 taps) and the whole shift family over
200 x 262144 complex samples, on the current JAX backend AND in the
reference C build on this host's CPU (ctypes).  Prints one JSON line per
kernel with seconds-per-200-iterations (the reference's unit) and Msps.

    python bench_kernels.py            # TPU (axon) by default
    python bench_kernels.py --platform cpu
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

T200_N = 262144
T200_ITERS = 200


def bench_tpu(kernels=None):
    import jax
    import jax.numpy as jnp
    from csdr_tpu import firdes
    from csdr_tpu.core.cplx import CF
    from csdr_tpu.kernels.fir_pallas import fir_decimate_best
    from csdr_tpu.ops import shift
    from csdr_tpu.utils.timing import time_kernel

    rng = np.random.default_rng(0)
    x = CF(jnp.asarray(rng.standard_normal(T200_N).astype(np.float32)),
           jnp.asarray(rng.standard_normal(T200_N).astype(np.float32)))
    taps = jnp.asarray(firdes.firdes_lowpass_f(1023, 0.05))
    kout = (T200_N - 1023) // 10 + 1

    jobs = {
        # one direct-NCO shift op stands in for all 5 reference variants:
        # on TPU the recurrence tricks are anti-optimizations (SURVEY §2.3)
        "shift_cc": lambda x: shift.shift_cc(x, 0.2, 0.0)[0],
        "fir_decimate_cc": lambda x: fir_decimate_best(x, taps, 10, kout),
    }
    out = {}
    for name, fn in jobs.items():
        per = time_kernel(fn, x)
        out[name] = (per * T200_ITERS, T200_N / per / 1e6)
    return out


def bench_ref():
    sys.path.insert(0, "tests/ref")
    import ctypes
    try:
        import refbind
        lib = refbind.lib()
    except Exception:
        return {}
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(T200_N) +
         1j * rng.standard_normal(T200_N)).astype(np.complex64)
    xi = refbind.as_cf(x)
    out = np.zeros_like(xi)
    res = {}

    def timeit(name, call, iters=20):
        call()  # warm
        t0 = time.perf_counter()
        for _ in range(iters):
            call()
        per = (time.perf_counter() - t0) / iters
        res[name] = (per * T200_ITERS, T200_N / per / 1e6)

    taps = refbind.firdes_lowpass_f(1023, 0.05)
    f32p = refbind.f32p
    lib.fir_decimate_cc.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_int,
                                    f32p, ctypes.c_int]
    timeit("fir_decimate_cc",
           lambda: lib.fir_decimate_cc(xi, out, T200_N, 10, taps, 1023),
           iters=3)
    lib.shift_math_cc.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_float,
                                  ctypes.c_float]
    lib.shift_math_cc.restype = ctypes.c_float
    timeit("shift_math_cc",
           lambda: lib.shift_math_cc(xi, out, T200_N, 0.2, 0.0))
    return res


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    tpu = bench_tpu()
    ref = bench_ref()
    for name, (s200, msps) in tpu.items():
        rec = {"kernel": name, "backend": "jax",
               "sec_per_200x262144": round(s200, 4), "Msps": round(msps, 1)}
        rname = name if name in ref else (
            "shift_math_cc" if name == "shift_cc" else None)
        if rname and rname in ref:
            rec["ref_cpu_sec"] = round(ref[rname][0], 3)
            rec["speedup"] = round(ref[rname][0] / s200, 1)
        print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
