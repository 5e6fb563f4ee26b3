"""Weak-scaling efficiency rig (BASELINE: >=85% from 1 chip to N hosts).

Runs the channel x time sharded fastddc channelizer bank
(csdr_tpu/parallel/sharded_ddc.py) and the WFM receiver bank
(parallel/sharded_wfm.py) over 1..N-device meshes with FIXED PER-DEVICE
LOAD, and reports wideband samples/s and efficiency vs. the 1-device rate.

On this machine only one real TPU chip is attached, so `--platform cpu`
exercises the rig on a virtual device mesh (set
XLA_FLAGS=--xla_force_host_platform_device_count=8); on a pod slice the
same script measures real ICI scaling.  Prints one JSON line per mesh size.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def bench_ddc_bank(mesh, frames_per_shard=256, c_total=64):
    import jax
    from csdr_tpu.parallel import sharded_ddc
    from csdr_tpu.core.cplx import CF
    from jax.sharding import NamedSharding, PartitionSpec as P
    from csdr_tpu.utils.timing import time_kernel

    step, x, ddc, _ = sharded_ddc.example_ddc_bank(
        mesh, frames_per_shard=frames_per_shard, c_total=c_total,
        decimation=16)
    sh = NamedSharding(mesh, P("time"))
    x = CF(jax.device_put(x.re, sh), jax.device_put(x.im, sh))
    n = x.shape[0]
    per = time_kernel(step, x)
    return n / per / 1e6, step, x


def bench_wfm_bank(mesh, per_shard=12800 * 8, c_total=8):
    import jax
    from csdr_tpu.parallel import sharded_wfm
    from csdr_tpu.core.cplx import CF
    from jax.sharding import NamedSharding, PartitionSpec as P
    from csdr_tpu.utils.timing import time_kernel

    n = per_shard * mesh.shape["time"]
    step, x = sharded_wfm.example_bank(mesh, n, c_total=c_total)
    sh = NamedSharding(mesh, P("time"))
    x = CF(jax.device_put(x.re, sh), jax.device_put(x.im, sh))
    per = time_kernel(step, x)
    return n / per / 1e6, step, x


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None,
                    help="jax platform override (cpu for virtual mesh)")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host: call jax.distributed.initialize() "
                         "(set JAX coordinator env vars / run under the pod "
                         "launcher); the mesh then spans all hosts' devices "
                         "and the halo ppermutes ride ICI/DCN")
    ap.add_argument("--bank", choices=["ddc", "wfm"], default="ddc")
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--frames", type=int, default=256,
                    help="fastddc frames per time-shard (reduce on cpu)")
    ap.add_argument("--collectives", action="store_true",
                    help="report per-step collective bytes (from the "
                         "compiled HLO) for each mesh size")
    ap.add_argument("--coordinator", default=None,
                    help="with --distributed: coordinator address "
                         "host:port (else jax auto-detects from env)")
    ap.add_argument("--num_processes", type=int, default=None)
    ap.add_argument("--process_id", type=int, default=None)
    ap.add_argument("--sizes", default=None,
                    help="comma-separated device counts (default: powers "
                         "of two up to the device count)")
    args = ap.parse_args(argv)
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.distributed:
        if args.coordinator:
            jax.distributed.initialize(
                coordinator_address=args.coordinator,
                num_processes=args.num_processes,
                process_id=args.process_id)
        else:
            jax.distributed.initialize()
    from jax.sharding import Mesh

    devs = jax.devices()
    if args.sizes:
        sizes = [int(s) for s in args.sizes.split(",")]
    else:
        sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devs)]
    base = None
    for n in sizes:
        # time-major factorization: chan shards only when channels allow
        chan = 1 if n <= 2 else 2
        time = n // chan
        mesh = Mesh(np.array(devs[:n]).reshape(chan, time), ("chan", "time"))
        if args.bank == "ddc":
            msps, step, x = bench_ddc_bank(mesh, frames_per_shard=args.frames,
                                           c_total=args.channels)
        else:
            msps, step, x = bench_wfm_bank(mesh, c_total=max(8, 2 * chan))
        if base is None:
            base = msps
        eff = msps / (base * n)
        rec = {
            "bank": args.bank, "devices": n, "mesh": f"{chan}x{time}",
            "wideband_Msps": round(msps, 1),
            "scaling_efficiency": round(eff, 3),
        }
        if args.collectives:
            from csdr_tpu.utils.collectives import collective_report
            rec["collectives_per_step"] = collective_report(step, x)
        if devs[0].platform == "cpu":
            # virtual devices share one host's cores: weak scaling CANNOT
            # speed up, so efficiency here only validates the rig runs;
            # real numbers require a multi-chip slice
            rec["note"] = "virtual cpu mesh - rig validation only"
        if jax.process_index() == 0:
            print(json.dumps(rec))
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
