"""FFT backend A/B on the current platform: XLA Stockham (core/fft.py) vs
the VMEM matmul-FFT pallas kernel (kernels/fft_pallas.py), plus the
consumers that changed order (fft_cc block, fftfilt round trip, classed
fastddc fwd+inv).

Usage:  python bench_fft.py [--platform cpu] [--quick]
Prints one JSON line per row to stdout.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _mk(b, n, seed=0):
    import jax.numpy as jnp
    from csdr_tpu.core.cplx import CF
    rng = np.random.default_rng(seed)
    return CF(jnp.asarray(rng.standard_normal((b, n)), jnp.float32),
              jnp.asarray(rng.standard_normal((b, n)), jnp.float32))


def row(**kw):
    print(json.dumps(kw), flush=True)


def bench_transforms(quick=False):
    from csdr_tpu.core import fft as cfft
    from csdr_tpu.kernels import fft_pallas as fk
    from csdr_tpu.utils.timing import time_kernel

    sizes = [(1024, 1024), (4096, 256)] if quick else \
        [(256, 4096), (1024, 1024), (2048, 512), (4096, 256)]
    for n, b in sizes:
        x = _mk(b, n)
        samples = b * n
        per_st = time_kernel(lambda x: cfft.fft(x).re, x)
        row(kind="stockham_xla", n=n, batch=b,
            msps=round(samples / per_st / 1e6, 1),
            eff_io_GBps=round(16e-9 * samples / per_st, 1))
        for prec in ("HIGH", "HIGHEST"):
            per_k = time_kernel(lambda x: fk.fft_ko(x, prec).re, x)
            row(kind=f"vmem_kernel_{prec}", n=n, batch=b,
                msps=round(samples / per_k / 1e6, 1),
                eff_io_GBps=round(16e-9 * samples / per_k, 1),
                speedup_vs_stockham=round(per_st / per_k, 2))
        per_nat = time_kernel(lambda x: fk.fft_natural(x, "HIGH").re, x)
        row(kind="vmem_kernel_natural_order", n=n, batch=b,
            msps=round(samples / per_nat / 1e6, 1),
            speedup_vs_stockham=round(per_st / per_nat, 2))
        per_inv = time_kernel(lambda x: fk.ifft_ko(x, "HIGH").re, x)
        row(kind="vmem_kernel_inverse", n=n, batch=b,
            msps=round(samples / per_inv / 1e6, 1))


def bench_fftfilt(quick=False):
    """SSB-style bandpass: full overlap-add round trip (fwd+mult+inv)."""
    import jax.numpy as jnp
    from csdr_tpu.core.cplx import CF
    from csdr_tpu.ops import fftfilt
    from csdr_tpu.utils.timing import time_kernel

    blk = fftfilt.bandpass_fir_fft_block(0.0, 0.25, 0.015)  # fft 1024
    b = 512 if quick else 2048
    n = b * blk.input_size
    x = _mk(1, n, seed=1)
    flat = CF(x.re[0], x.im[0])
    st = blk.init()
    per = time_kernel(lambda x: blk.apply(st, x)[1].re, flat)
    row(kind="fftfilt_bandpass_stream", fft_size=blk.fft_size, samples=n,
        msps=round(n / per / 1e6, 1))


def bench_fastddc_classed(quick=False):
    import jax.numpy as jnp
    from csdr_tpu.core.cplx import CF
    from csdr_tpu.ops import fastddc as fd
    from csdr_tpu.utils.timing import time_kernel

    ddc = fd.fastddc_init(0.05, 50)
    rng = np.random.default_rng(0)
    rates = rng.uniform(-0.4, 0.4, 64)
    frames = 500 if quick else 2500
    n = frames * ddc.input_size
    x = _mk(1, n)
    flat = CF(x.re[0], x.im[0])
    for order in ("natural", "kernel"):
        fwd = fd.fastddc_fwd_block(ddc, spectra_order=order)
        inv = fd.fastddc_inv_block(ddc, rates, spectra_order=order)
        s0 = (fwd.init(), inv.init())

        def kernel(x, s):
            _, spectra = fwd.apply(s[0], x)
            _, out = inv.apply(s[1], spectra)
            return out.data
        per = time_kernel(kernel, flat, aux=s0)
        row(kind=f"fastddc_D50_64ch_{order}_order", frames=frames,
            msps=round(n / per / 1e6, 1))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default=None,
                    help="transforms|fftfilt|fastddc")
    args = ap.parse_args(argv)
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if jax.default_backend() != "tpu":
        # kernel rows only lower on TPU; interpret mode keeps the rig
        # runnable as a CPU smoke test (timings meaningless there)
        import os
        os.environ.setdefault("CSDR_PALLAS_INTERPRET", "1")
    row(platform=jax.default_backend())
    if args.only in (None, "transforms"):
        bench_transforms(args.quick)
    if args.only in (None, "fftfilt"):
        bench_fftfilt(args.quick)
    if args.only in (None, "fastddc"):
        bench_fastddc_classed(args.quick)


if __name__ == "__main__":
    sys.exit(main() or 0)
