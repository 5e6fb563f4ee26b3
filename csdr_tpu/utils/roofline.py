"""Roofline accounting: measured per-chip peaks + per-kernel efficiency.

BASELINE.md sets the perf bar as "FIR and FFT kernels at speed-of-light
HBM-bandwidth roofline per chip" — this module makes that claim checkable.
Since no vendor datasheet is queryable at runtime (and the axon tunnel adds
its own constants), both roofline ceilings are MEASURED on the attached
chip with the same `time_kernel` discipline as every other number:

- HBM bandwidth: streaming triad ``y = a*x + c`` over an array far larger
  than VMEM (read + write = 8 bytes/element of traffic).
- MXU rate: large square f32 matmul at each `jax.lax.Precision`
  (DEFAULT = 1 bf16 pass, HIGH = 3 passes, HIGHEST = 6 passes), plus a
  native bf16 matmul for the headline peak.

`account()` then turns a kernel's (bytes_moved, flops, seconds) into the
fraction of each ceiling it achieves and names the binding resource —
the reference's equivalent is its build-time vectorization proof
(Makefile:58-60) plus the test200 harness (test200.c:42-124); here the
proof is at runtime against the actual silicon.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from csdr_tpu.utils.timing import time_kernel


def _dev_noise(shape, dtype=jnp.float32, seed=0):
    """Pseudo-random data generated ON DEVICE (a host->device transfer of
    benchmark operands over the axon tunnel takes minutes)."""
    @jax.jit
    def gen():
        return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32
                                 ).astype(dtype)
    return jax.block_until_ready(gen())


@functools.lru_cache(maxsize=None)
def measure_hbm_bw(n_mb: int = 256) -> float:
    """Streaming READ bandwidth in bytes/s: a sum-reduction over n_mb MB of
    float32 (traffic = n_mb MB).  A triad (y = a*x + c) is NOT used because
    the timing harness reduces the kernel output, and XLA fuses the triad
    into that reduction — eliding the write and over-reporting bandwidth
    ~2x.  A pure read stream is fusion-proof: the n_mb MB MUST cross HBM."""
    n = n_mb * (1 << 20) // 4
    x = _dev_noise((n,))

    per = time_kernel(lambda x: jnp.sum(x), x, k_pair=(32, 512))
    return 1.0 * n * 4 / per


@functools.lru_cache(maxsize=None)
def measure_mxu_flops(precision_name: str = "HIGHEST", m: int = 4096) -> float:
    """Matmul flops/s (2*m^3 per call) at the given precision.

    precision_name: 'DEFAULT' | 'HIGH' | 'HIGHEST' (f32 operands) or
    'BF16' (native bf16 operands, f32 accumulation) — 'BF16' is the
    chip's headline peak."""
    if precision_name == "BF16":
        a = _dev_noise((m, m), jnp.bfloat16, 1)
        b = _dev_noise((m, m), jnp.bfloat16, 2)
        prec = jax.lax.Precision.DEFAULT
    else:
        a = _dev_noise((m, m), jnp.float32, 1)
        b = _dev_noise((m, m), jnp.float32, 2)
        prec = getattr(jax.lax.Precision, precision_name)

    def kern(a):
        return jnp.dot(a, b, precision=prec,
                       preferred_element_type=jnp.float32)

    per = time_kernel(kern, a, k_pair=(16, 128))
    return 2.0 * m * m * m / per


@functools.lru_cache(maxsize=None)
def measure_vpu_flops(n: int = 4_000_000, chain: int = 64) -> float:
    """Elementwise fma-chain flops/s (2*chain flops/element, one fused
    pass): the VPU ceiling for diagonal/elementwise work — the binding
    resource for the fastddc fold at high channel counts (r5: the C=256
    channelizer is fold-bound at ~40% of this peak)."""
    x = _dev_noise((n,))

    def kern(x):
        y = x
        for _ in range(chain):
            y = y * np.float32(1.0000001) + np.float32(1e-7)
        return y

    per = time_kernel(kern, x, k_pair=(32, 256))
    return 2.0 * chain * n / per


def device_peaks(precisions=("HIGHEST", "HIGH", "BF16")) -> dict:
    """Measured ceilings for the attached chip (cached per process)."""
    peaks = {"device": jax.devices()[0].device_kind,
             "hbm_bw_GBps": measure_hbm_bw() / 1e9}
    for p in precisions:
        peaks[f"mxu_{p.lower()}_Tflops"] = measure_mxu_flops(p) / 1e12
    return peaks


def account(name: str, seconds: float, bytes_moved: float, flops: float,
            peaks: dict, precision_name: str = "HIGHEST",
            ideal_flops: float | None = None,
            vpu_flops: float | None = None) -> dict:
    """Roofline account for one kernel invocation.

    bytes_moved: total HBM traffic the kernel MUST move (inputs read once +
    outputs written once — the compulsory traffic, not what the compiled
    program happens to move).  flops: real flops the implementation
    executes; ideal_flops: the algorithmic minimum (when the formulation
    does extra MACs, e.g. the Toeplitz slab overlap).  pct_of_roofline is
    achieved/ceiling on the BINDING resource, using ideal_flops — i.e. the
    fraction of the chip's speed-of-light for the ALGORITHM, charging any
    formulation overhead against the kernel."""
    if ideal_flops is None:
        ideal_flops = flops
    bw = peaks["hbm_bw_GBps"] * 1e9
    mxu = peaks[f"mxu_{precision_name.lower()}_Tflops"] * 1e12
    t_mem = bytes_moved / bw
    t_mxu = ideal_flops / mxu
    bound = "mxu" if t_mxu > t_mem else "hbm"
    t_light = max(t_mem, t_mxu)
    # vpu_flops: work that intrinsically cannot ride the MXU (diagonal /
    # elementwise stages, e.g. the fastddc per-channel spectrum-taps fold)
    t_vpu = None
    if vpu_flops:
        vpu = peaks.get("vpu_Tflops", 0.0) * 1e12
        if vpu > 0:
            t_vpu = vpu_flops / vpu
            if t_vpu > t_light:
                bound, t_light = "vpu", t_vpu
    rec = {
        "kernel": name,
        "achieved_GBps": round(bytes_moved / seconds / 1e9, 1),
        "achieved_Tflops": round(flops / seconds / 1e12, 2),
        "ideal_Tflops": round(ideal_flops / seconds / 1e12, 2),
        "mac_overhead_x": round(flops / max(ideal_flops, 1.0), 2),
        "bound_by": bound,
        "pct_of_roofline": round(100.0 * t_light / seconds, 1),
        # how busy the matmul unit actually is on EXECUTED flops: separates
        # "the chip is idle" from "the formulation does extra MACs" — e.g.
        # the classed fastddc inverse reads 4.9% of the algorithmic
        # roofline while the MXU runs at ~45% (the dense-matmul form's MAC
        # amplification is the gap, and the factored alternatives measured
        # SLOWER on this chip: ops/fastddc.fastddc_inv_factored_batch)
        "mxu_busy_pct": round(100.0 * (flops / mxu) / seconds, 1),
        "hbm_busy_pct": round(100.0 * t_mem / seconds, 1),
        "precision": precision_name,
    }
    if t_vpu is not None:
        rec["vpu_busy_pct"] = round(100.0 * t_vpu / seconds, 1)
    return rec
