"""Staged on-chip validation for freshly-landed kernel paths (run after an
axon-tunnel wedge or before the driver bench): each stage is a separate
bounded subprocess so a kernel that wedges the worker loses only its stage,
and the log records exactly which construct did it.

Stages (in risk order — cheapest/safest first):
  0 probe      tiny reduction (is the tunnel alive at all?)
  1 fft-golden matmul-FFT kernel vs Stockham on-chip, N=1024..16384
               (incl. the shared-base mode N>2048) — correctness only
  2 fft-bench  bench_fft.py --quick (kernel vs Stockham timing)
  3 goldens    the 36 reference-C golden tests with
               CSDR_TPU_TEST_PLATFORM=axon
  4 variants   bench_roofline.py --variants (FIR HIGH dot-packing x jb
               sweep — its winner should be reflected in
               fir_pallas._HIGH_VARIANT before stage 5)
  5 bench      bench.py (the driver metric, incl. fastddc secondaries)

Usage: python bench_onchip_checklist.py [--from N] [--only N]
Writes per-stage logs to /tmp/onchip_stage<N>.log and a summary line each.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

MARKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "ONCHIP_VALIDATED.json")


def record_pass(num: int) -> None:
    """Append a passed stage to ONCHIP_VALIDATED.json.  bench.py reads this
    marker to decide whether the never-run-on-silicon pallas kernel
    families may run in the unattended driver bench (stage 1 certifies the
    matmul-FFT kernel, stage 3 the fastddc vmem inverse)."""
    passed: list = []
    try:
        with open(MARKER) as f:
            passed = json.load(f).get("stages_passed", [])
    except Exception:  # noqa: BLE001
        pass
    if num not in passed:
        passed = sorted(set(passed) | {num})
    with open(MARKER, "w") as f:
        json.dump({"stages_passed": passed,
                   "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}, f)
        f.write("\n")

STAGE1_BODY = r"""
import numpy as np
import jax
from csdr_tpu.core.cplx import CF
from csdr_tpu.core import fft as cfft
from csdr_tpu.kernels import fft_pallas as fk

rng = np.random.default_rng(0)
for n, b in [(1024, 64), (2048, 32), (4096, 16), (8192, 8), (16384, 4)]:
    if not fk.supported(n, b):
        print(f"n={n}: unsupported, skip", flush=True)
        continue
    x = CF(jax.numpy.asarray(rng.standard_normal((b, n)), jax.numpy.float32),
           jax.numpy.asarray(rng.standard_normal((b, n)), jax.numpy.float32))
    ref = np.fft.fft(np.asarray(x.re) + 1j * np.asarray(x.im), axis=-1)
    y = fk.fft_natural(x, "HIGH")
    got = np.asarray(y.re) + 1j * np.asarray(y.im)
    err = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    snr = -20 * np.log10(err)
    print(f"n={n} b={b}: {snr:.1f} dB", flush=True)
    assert snr > 90, (n, snr)
    # round trip through the kernel-order inverse (ifft_ko is UNNORMALIZED
    # like FFTW backward, so rt carries a factor of n)
    z = fk.ifft_ko(fk.fft_ko(x, "HIGH"), "HIGH")
    rt = (np.asarray(z.re) + 1j * np.asarray(z.im)) / n
    x_np = np.asarray(x.re) + 1j * np.asarray(x.im)
    err2 = np.linalg.norm(rt - x_np) / np.linalg.norm(x_np)
    print(f"   roundtrip rel err {err2:.2e}", flush=True)
    assert err2 < 3e-5, (n, err2)
print("stage1 OK")
"""


def run_stage(num: int, argv: list[str], timeout_s: int,
              body: str | None = None) -> bool:
    import os
    log = f"/tmp/onchip_stage{num}.log"
    env = dict(os.environ)
    if num == 3:
        # the golden suite's conftest pins JAX_PLATFORMS from this var
        env["CSDR_TPU_TEST_PLATFORM"] = "axon"
    t0 = time.time()
    try:
        with open(log, "w") as f:
            if body is not None:
                p = subprocess.run([sys.executable, "-"], input=body,
                                   text=True, stdout=f, stderr=f,
                                   timeout=timeout_s, env=env)
            else:
                p = subprocess.run(argv, stdout=f, stderr=f,
                                   timeout=timeout_s, env=env)
        ok = p.returncode == 0
    except subprocess.TimeoutExpired:
        ok = False
    dt = time.time() - t0
    tail = open(log).read().strip().splitlines()[-3:]
    print(f"stage {num}: {'OK' if ok else 'FAIL/TIMEOUT'} ({dt:.0f}s) "
          f"log={log}", flush=True)
    for ln in tail:
        print(f"   | {ln}", flush=True)
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--from", dest="start", type=int, default=0)
    ap.add_argument("--only", type=int, default=None)
    args = ap.parse_args()

    stages = [
        (0, None, 180,
         "import jax\nprint(float(jax.numpy.sum(jax.numpy.ones(8))))\n"
         "print('stage0 OK')"),
        (1, None, 1200, STAGE1_BODY),
        (2, [sys.executable, "bench_fft.py", "--quick"], 1800, None),
        (3, [sys.executable, "-m", "pytest", "-q", "--no-header",
             "tests/test_fir.py", "tests/test_shift.py",
             "tests/test_fastddc.py", "tests/test_fft.py",
             "tests/test_fftfilt.py", "tests/test_agc.py"], 3600, None),
        # FIR dot-packing variants sweep BEFORE the driver bench: its
        # winner should set fir_pallas._HIGH_VARIANT for stage 5
        (4, [sys.executable, "bench_roofline.py", "--variants"], 2400, None),
        (5, [sys.executable, "bench.py"], 3600, None),
    ]
    env_note = ("stage 3 needs CSDR_TPU_TEST_PLATFORM=axon in the "
                "environment; stage 0-2/4 run on the default (axon) backend")
    print(env_note, flush=True)
    for num, argv, to, body in stages:
        if args.only is not None and num != args.only:
            continue
        if num < args.start:
            continue
        if not run_stage(num, argv, to, body):
            print(f"stopping at failed stage {num} (a wedged worker needs "
                  "10-40 min; re-run with --from {num} later)", flush=True)
            return 1
        record_pass(num)
    return 0


if __name__ == "__main__":
    sys.exit(main())
