"""Roofline sweep + accounting for the metric kernels (VERDICT r1 item #1).

Measures, on the attached chip:
  1. the chip's ceilings (HBM triad bandwidth, MXU matmul rate per
     precision) via csdr_tpu.utils.roofline;
  2. fir_decimate_cc (D=10, T=1023 — the test200.c:42-124 configuration,
     and D=10, T=81) across Toeplitz tile R x matmul precision;
  3. the fastddc 64-channel fused inverse;
and prints a JSON roofline account per kernel: achieved GB/s + Tflops,
MAC overhead of the formulation, the binding resource, and
pct_of_roofline (fraction of the chip's speed-of-light for the algorithm).

Run on the real chip: `python bench_roofline.py` (axon default).
CPU smoke test: `python bench_roofline.py --platform cpu --quick`.
"""

from __future__ import annotations

import argparse
import json
import sys


def fir_flops(kout: int, t: int, d: int, tile_r: int | None):
    """(actual, ideal) flops for one decimating-FIR call.

    Ideal: 2 planes x T real MACs x 2 flops per output.
    Toeplitz actual: slab_len = (R-1)*D+T MACs per output per plane."""
    ideal = 4.0 * t * kout
    if tile_r is None:
        return ideal, ideal
    tr = 128 if tile_r == "vmem" else tile_r   # vmem kernel is a 128-tile
    slab = (tr - 1) * d + t
    return 4.0 * slab * kout, ideal


def bench_fir(tile_r, precision_name: str, d=10, taps_len=1023,
              kout=2048 * 128):
    """tile_r: an int pins the XLA Toeplitz path at that output tile;
    'vmem' measures the pallas VMEM-slab kernel (the production dispatch
    for long taps)."""
    import jax
    from csdr_tpu import firdes
    from csdr_tpu.core.cplx import CF
    from csdr_tpu.kernels import fir_pallas as fp
    from csdr_tpu.utils.timing import time_kernel
    import numpy as np

    # HIGH1..HIGH4 are the vmem kernel's dot-packing variants (strings pass
    # straight through fir_decimate_vmem); everything else is a lax.Precision
    prec = (precision_name if precision_name.startswith("HIGH") and
            len(precision_name) == 5 else
            getattr(jax.lax.Precision, precision_name))
    taps = np.asarray(firdes.firdes_lowpass_f(taps_len, 0.5 / d), np.float32)
    n = kout * d
    tail = max(((taps_len - 1 + d - 1) // d) * d,
               (kout // 128 + 8) * 128 * d - n)   # vmem-kernel full need:
    # the in-call zero-pad concat must never run inside the timed loop
    rng = np.random.default_rng(0)
    x = CF(jax.numpy.asarray(rng.standard_normal(n + tail).astype(np.float32)),
           jax.numpy.asarray(rng.standard_normal(n + tail).astype(np.float32)))
    if tile_r == "vmem" and jax.default_backend() == "tpu":
        fn = lambda x: fp.fir_decimate_vmem(x, taps, d, kout, prec)
    else:
        tr = 128 if tile_r == "vmem" else tile_r
        taps_j = jax.numpy.asarray(taps)

        def fn(x, tr=tr):
            kout_pad = -(-kout // tr) * tr
            w = fp._toeplitz_w(taps, d, tr)
            yr, yi = fp._fir_decimate_toeplitz(x.re, x.im, w, d, kout_pad,
                                               prec)
            return CF(yr[:kout], yi[:kout])
    per = time_kernel(
        fn, x, k_pair=(128, 2048) if jax.default_backend() == "tpu" else None)
    msps = n / per / 1e6
    # compulsory HBM traffic: planar complex in (8 B/sample) + out
    bytes_moved = 8.0 * (n + kout)
    return per, msps, bytes_moved


def bench_fastddc(decimation=16, channels=64, frames=1024):
    import jax
    from csdr_tpu.core.cplx import CF
    from csdr_tpu.ops import fastddc as fd
    from csdr_tpu.utils.timing import time_kernel
    import numpy as np

    ddc = fd.fastddc_init(0.05, decimation)
    rng = np.random.default_rng(0)
    rates = rng.uniform(-0.4, 0.4, channels)
    fwd = fd.fastddc_fwd_block(ddc)
    inv = fd.fastddc_inv_block(ddc, rates)
    n = frames * ddc.input_size
    x = CF(jax.numpy.asarray(rng.standard_normal(n).astype(np.float32)),
           jax.numpy.asarray(rng.standard_normal(n).astype(np.float32)))
    s0 = (fwd.init(), inv.init())

    def kernel(x, s):
        _, spectra = fwd.apply(s[0], x)
        _, out = inv.apply(s[1], spectra)
        return out.data

    per = time_kernel(kernel, x, aux=s0,
                      k_pair=(16, 128) if jax.default_backend() == "tpu"
                      else None)
    # flops: fwd FFT (planar radix-2: ~5 N log2 N real flops per frame,
    # counted on the fft_size grid) + fused inverse matmul
    # spectra (frames, fft) @ G (fft, C*m) complex x complex = 8 real
    # flops per MAC (4 mult + 4 add in planar form).
    import math
    fft = ddc.fft_size
    f_fft = 5.0 * fft * math.log2(fft) * frames
    m_out = ddc.post_input_size // ddc.post_decimation
    f_inv = 8.0 * frames * fft * channels * m_out
    # ideal inverse = per-channel folded spectrum (fft/D taps per output):
    # same matmul but only the nonzero fold diagonal -> fft/D MACs/output
    f_inv_ideal = 8.0 * frames * (fft // decimation) * channels * m_out
    bytes_moved = 8.0 * (n + frames * fft + frames * channels * m_out)
    return per, n / per / 1e6, bytes_moved, f_fft + f_inv, f_fft + f_inv_ideal


def variants_sweep():
    """Time the vmem kernel's HIGH dot-packing variants (same bf16x3
    product, different MXU dispatch shapes) and check each against the
    HIGHEST-precision pallas output.  Run on the real chip."""
    import jax
    import numpy as np
    from csdr_tpu import firdes
    from csdr_tpu.core.cplx import CF
    from csdr_tpu.kernels import fir_pallas as fp
    from csdr_tpu.utils.timing import time_kernel

    d, taps_len, kout = 10, 1023, 2048 * 128
    taps = np.asarray(firdes.firdes_lowpass_f(taps_len, 0.5 / d), np.float32)
    n = kout * d
    tail = max(((taps_len - 1 + d - 1) // d) * d,
               (kout // 128 + 8) * 128 * d - n)   # vmem-kernel full need:
    # the in-call zero-pad concat must never run inside the timed loop
    rng = np.random.default_rng(0)
    x = CF(jax.numpy.asarray(rng.standard_normal(n + tail).astype(np.float32)),
           jax.numpy.asarray(rng.standard_normal(n + tail).astype(np.float32)))
    ref = fp.fir_decimate_vmem(x, taps, d, kout, jax.lax.Precision.HIGHEST)
    ref_r = np.asarray(jax.device_get(ref.re))
    ref_i = np.asarray(jax.device_get(ref.im))
    pref = float(np.mean(ref_r**2 + ref_i**2))
    on_tpu = jax.default_backend() == "tpu"
    for pn in ("HIGH1", "HIGH2", "HIGH3", "HIGH4", "HIGH5", "HIGH6"):
        if pn == "HIGH5" and on_tpu:
            # Mosaic's tpu.dynamic_rotate is 32-bit-only: HIGH5's bf16
            # pltpu.roll fails to compile on silicon (interpret-only)
            print(json.dumps({"variant": pn,
                              "skipped": "bf16 roll unsupported by Mosaic"}))
            continue
        for jb in (32, 64, 128, 256):
            # per-step dot M = 2*jb (4*jb stacked variants): the MXU
            # fill/drain bubble lever called out in BENCHMARKS_R2
            try:
                y = fp.fir_decimate_vmem(x, taps, d, kout, pn, jb=jb)
                yr = np.asarray(jax.device_get(y.re))
                yi = np.asarray(jax.device_get(y.im))
                perr = float(np.mean((yr - ref_r)**2 + (yi - ref_i)**2))
                snr = 10 * np.log10(pref / perr) if perr else float("inf")
                per = time_kernel(lambda x, pn=pn, jb=jb: fp.fir_decimate_vmem(
                    x, taps, d, kout, pn, jb=jb), x, k_pair=(128, 2048))
                print(json.dumps({"variant": pn, "jb": jb,
                                  "Msps": round(n / per / 1e6, 1),
                                  "snr_vs_pallas_HIGHEST_dB": round(snr, 1)}))
            except Exception as e:  # noqa: BLE001 — a config that fails to
                # lower must not cost the rest of the sweep
                print(json.dumps({"variant": pn, "jb": jb,
                                  "error": (str(e).splitlines()
                                            or [repr(e)])[0][:160]}))
            sys.stdout.flush()

    # deep-d VMEM-cap validation (ADVICE r2): the default jb must shrink
    # with 128*d; run one d=64 config at the capped default and check it
    # compiles, fits, and matches the XLA Toeplitz HIGHEST output on-chip.
    for d2, t2 in ((64, 6145), (80, 8193)):
        try:
            kout2 = 512 * 128 // 8
            n2 = kout2 * d2
            # size to the kernel's FULL need at the capped jb (kout rounds
            # up to a jb*128 grid): no in-call zero-pad in the timed loop
            jb2 = fp._default_jb(d2, t2, kout2)
            kout2_pad = -(-kout2 // (jb2 * 128)) * (jb2 * 128)
            tail2 = max(((t2 - 1 + d2 - 1) // d2) * d2,
                        (kout2_pad // 128 + 8) * 128 * d2 - n2)
            taps2 = np.asarray(firdes.firdes_lowpass_f(t2, 0.5 / d2),
                               np.float32)
            x2 = CF(jax.numpy.asarray(
                        rng.standard_normal(n2 + tail2).astype(np.float32)),
                    jax.numpy.asarray(
                        rng.standard_normal(n2 + tail2).astype(np.float32)))
            from csdr_tpu.ops.fir import fir_decimate_cc
            refd = fir_decimate_cc(x2, taps2, d2,
                                   jax.lax.Precision.HIGHEST)[:kout2]
            rr = np.asarray(jax.device_get(refd.re))
            ri = np.asarray(jax.device_get(refd.im))
            p2 = float(np.mean(rr**2 + ri**2))
            y2 = fp.fir_decimate_vmem(x2, taps2, d2, kout2, "HIGH")
            e2 = float(np.mean((np.asarray(jax.device_get(y2.re)) - rr)**2
                               + (np.asarray(jax.device_get(y2.im)) - ri)**2))
            snr2 = 10 * np.log10(p2 / e2) if e2 else float("inf")
            per2 = time_kernel(
                lambda x2: fp.fir_decimate_vmem(x2, taps2, d2, kout2, "HIGH"),
                x2, k_pair=(64, 1024))
            print(json.dumps({"deepd": d2, "t": t2, "jb_capped": jb2,
                              "Msps": round(n2 / per2 / 1e6, 1),
                              "snr_vs_xla_HIGHEST_dB": round(snr2, 1)}))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"deepd": d2, "t": t2,
                              "error": (str(e).splitlines()
                                        or [repr(e)])[0][:160]}))
        sys.stdout.flush()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--variants", action="store_true",
                    help="sweep the vmem HIGH dot-packing variants only")
    args = ap.parse_args()
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.variants:
        variants_sweep()
        return

    from csdr_tpu.utils import roofline

    if args.quick:   # CPU smoke test: small operands, one precision
        peaks = {"device": jax.devices()[0].device_kind,
                 "hbm_bw_GBps": roofline.measure_hbm_bw(16) / 1e9,
                 "mxu_highest_Tflops":
                     roofline.measure_mxu_flops("HIGHEST", 1024) / 1e12}
    else:
        peaks = roofline.device_peaks(precisions=("HIGHEST", "HIGH"))
    print(json.dumps({"peaks": peaks}))
    sys.stdout.flush()

    kout = 128 * 128 if args.quick else 512 * 128
    tiles = [128] if args.quick else ["vmem", 64, 128, 256]
    precisions = ["HIGHEST"] if args.quick else ["HIGHEST", "HIGH"]
    best = None
    for taps_len in ([1023] if args.quick else [1023]):
        for tr in tiles:
            for pn in precisions:
                per, msps, byts = bench_fir(tr, pn, taps_len=taps_len,
                                            kout=kout)
                fl, fl_ideal = fir_flops(kout, taps_len, 10, tr)
                acct = roofline.account(
                    f"fir_decimate D=10 T={taps_len} R={tr}", per, byts,
                    fl, peaks, pn, fl_ideal)
                acct["Msps"] = round(msps, 1)
                print(json.dumps(acct))
                sys.stdout.flush()
                if taps_len == 1023 and (best is None or msps > best[0]):
                    best = (msps, tr, pn, acct)

    per, msps, byts, fl, fl_ideal = bench_fastddc(
        frames=64 if args.quick else 1024)
    acct = roofline.account("fastddc 64ch D=16 fwd+inv", per, byts, fl,
                            peaks, "HIGHEST" if args.quick else "HIGH",
                            fl_ideal)
    acct["Msps"] = round(msps, 1)
    print(json.dumps(acct))
    if best:
        print(json.dumps({"best_fir_config": {
            "Msps": round(best[0], 1), "tile_r": best[1],
            "precision": best[2], "pct_of_roofline":
            best[3]["pct_of_roofline"]}}))


if __name__ == "__main__":
    main()
