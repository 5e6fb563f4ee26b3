"""Benchmark: complex Msamples/s/chip for the hot kernels (BASELINE.json).

Measures the streaming polyphase fir_decimate_cc (the reference's headline
kernel, test200.c:42-124 configuration: D=10, 1023 taps) on the current JAX
backend, and the same kernel in the reference C build on this host's CPU as
``vs_baseline`` denominator (the reference publishes no absolute numbers —
BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def bench_tpu_fir_decimate(d=10, taps_len=1023, kout=512 * 128):
    import jax
    from csdr_tpu import firdes
    from csdr_tpu.core.cplx import CF
    from csdr_tpu.kernels.fir_pallas import fir_decimate_best
    from csdr_tpu.utils.timing import time_kernel

    taps = jax.numpy.asarray(firdes.firdes_lowpass_f(taps_len, 0.5 / d))
    n = kout * d
    tail = ((taps_len - 1 + d - 1) // d) * d
    rng = np.random.default_rng(0)
    x = CF(jax.numpy.asarray(rng.standard_normal(n + tail).astype(np.float32)),
           jax.numpy.asarray(rng.standard_normal(n + tail).astype(np.float32)))
    per = time_kernel(lambda x: fir_decimate_best(x, taps, d, kout), x)
    return n / per / 1e6                     # input Msamples/s


def bench_ref_fir_decimate(d=10, taps_len=1023, n=1 << 20, iters=5):
    sys.path.insert(0, "tests/ref")
    try:
        import refbind
        taps = refbind.firdes_lowpass_f(taps_len, 0.5 / d)
        rng = np.random.default_rng(0)
        x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
        refbind.fir_decimate_cc(x, taps, d)  # warm
        t0 = time.perf_counter()
        for _ in range(iters):
            refbind.fir_decimate_cc(x, taps, d)
        dt = (time.perf_counter() - t0) / iters
        return n / dt / 1e6
    except Exception:
        return None


def main():
    tpu = bench_tpu_fir_decimate()
    ref = bench_ref_fir_decimate()
    vs = (tpu / ref) if ref else None
    print(json.dumps({
        "metric": "fir_decimate_cc throughput (D=10, 1023 taps)",
        "value": round(tpu, 1),
        "unit": "complex Msamples/s/chip",
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == "__main__":
    main()
