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
import os
import sys
import time

import numpy as np


def bench_tpu_fir_decimate(d=10, taps_len=1023, kout=2048 * 128,
                           precision_name="HIGH"):
    """Headline kernel at the VMEM-slab pallas path.  precision HIGH is the
    manual bf16x3 kernel: ~107 dB SNR vs the f32 reference (above the
    100 dB golden bar; the W split is exact) at ~1.45x the HIGHEST rate."""
    import jax
    from csdr_tpu import firdes
    from csdr_tpu.core.cplx import CF
    from csdr_tpu.kernels.fir_pallas import fir_decimate_best
    from csdr_tpu.utils.timing import time_kernel

    prec = getattr(jax.lax.Precision, precision_name)
    taps = jax.numpy.asarray(firdes.firdes_lowpass_f(taps_len, 0.5 / d))
    n = kout * d
    # size the input to the vmem kernel's full need (main + 8 halo rows) so
    # its zero-pad concat never runs INSIDE the timed call — that pad was a
    # full extra pass over the input per iteration, charged to the kernel
    tail = max(((taps_len - 1 + d - 1) // d) * d,
               (kout // 128 + 8) * 128 * d - n)
    rng = np.random.default_rng(0)
    x = CF(jax.numpy.asarray(rng.standard_normal(n + tail).astype(np.float32)),
           jax.numpy.asarray(rng.standard_normal(n + tail).astype(np.float32)))
    per = time_kernel(lambda x: fir_decimate_best(x, taps, d, kout, prec), x,
                      k_pair=((128, 2048) if jax.default_backend() == "tpu"
                              else None))
    return n / per / 1e6, per                # input Msamples/s, s/call


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


def bench_tpu_fastddc(decimation=16, channels=64, frames=1024):
    """64-channel fastddc channelizer (BASELINE config 5), single chip:
    wideband complex Msamples/s.  Divisible-post configs (D=16) run the
    fully-fused channelizer block (subsequence-split DFT matmul + factored
    vmem inverse — no standalone FFT); classed configs (D=50) run
    fwd FFT + the phase-classed batched inverse."""
    import jax
    from csdr_tpu.core.cplx import CF
    from csdr_tpu.ops import fastddc as fd
    from csdr_tpu.utils.timing import time_kernel

    ddc = fd.fastddc_init(0.05, decimation)
    rng = np.random.default_rng(0)
    rates = rng.uniform(-0.4, 0.4, channels)
    n = frames * ddc.input_size
    x = CF(jax.numpy.asarray(rng.standard_normal(n).astype(np.float32)),
           jax.numpy.asarray(rng.standard_normal(n).astype(np.float32)))
    # state carries the (large) fold/G matrices: pass as the UNPERTURBED
    # aux — as a perturbed arg the timing loop would copy the matrices
    # every iteration (236 MB/iter at D=50)
    if ddc.post_input_size % ddc.post_decimation == 0:
        chan = fd.fastddc_channelizer_block(ddc, rates)
        s0 = chan.init()

        def kernel(x, s):
            _, out = chan.apply(s, x)
            return out.data
    else:
        fwd = fd.fastddc_fwd_block(ddc, spectra_order="kernel")
        inv = fd.fastddc_inv_block(ddc, rates, spectra_order="kernel")
        s0 = (fwd.init(), inv.init())

        def kernel(x, s):
            _, spectra = fwd.apply(s[0], x)
            _, out = inv.apply(s[1], spectra)
            return out.data

    per = time_kernel(kernel, x, aux=s0)
    return n / per / 1e6


def bench_ref_fastddc(decimation=16, n_frames=16, iters=3):
    """Reference fastddc fwd+inv, ONE channel, this host's CPU."""
    sys.path.insert(0, "tests/ref")
    try:
        import refbind
        ddc = refbind.fastddc_init(0.05, decimation, 0.1)
        n = n_frames * ddc.input_size
        rng = np.random.default_rng(0)
        x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
        refbind.fastddc_reference(x, decimation, 0.1)  # warm
        t0 = time.perf_counter()
        for _ in range(iters):
            refbind.fastddc_reference(x, decimation, 0.1)
        dt = (time.perf_counter() - t0) / iters
        return n / dt / 1e6
    except Exception:
        return None


def bench_tpu_wfm(n=2_400_000):
    """End-to-end WFM advanced receiver (BASELINE config 2)."""
    from csdr_tpu.core import cplx
    from csdr_tpu.models import wfm
    from csdr_tpu.utils.timing import time_kernel

    rng = np.random.default_rng(0)
    x = cplx.from_numpy((rng.standard_normal(n) +
                         1j * rng.standard_normal(n)).astype(np.complex64))
    pipe = wfm.wfm_advanced(shift_rate=-0.2)
    st = pipe.init()
    per = time_kernel(lambda x: pipe.apply(st, x)[1].data, x)
    return n / per / 1e6


def bench_tpu_wfm_basic(n=2_400_000):
    """WFM basic receiver (BASELINE config 1): fmdemod_quadri_cf |
    fractional_decimator_ff 5 | deemphasis_wfm_ff at the 240 ksps demod
    rate (the u8->f conversion is a host-edge op)."""
    from csdr_tpu.core import cplx
    from csdr_tpu.models import wfm
    from csdr_tpu.utils.timing import time_kernel

    rng = np.random.default_rng(0)
    x = cplx.from_numpy((rng.standard_normal(n) +
                         1j * rng.standard_normal(n)).astype(np.complex64))
    pipe = wfm.wfm_basic()
    st = pipe.init()
    per = time_kernel(lambda x: pipe.apply(st, x)[1].data, x,
                      k_pair=(64, 512))
    return n / per / 1e6


def bench_tpu_nfm(n=2_400_000):
    """NFM receiver (BASELINE config 3): fir_decimate_cc 50 | fmdemod |
    limit_ff | deemphasis_nfm_ff | fastagc_ff."""
    from csdr_tpu.core import cplx
    from csdr_tpu.models import receivers
    from csdr_tpu.utils.timing import time_kernel

    rng = np.random.default_rng(0)
    x = cplx.from_numpy((rng.standard_normal(n) +
                         1j * rng.standard_normal(n)).astype(np.complex64))
    pipe = receivers.nfm_receiver()
    st = pipe.init()
    # (64, 512): at ~60 us/call a (16, 128) pair leaves only ~5 ms of
    # k-delta against the ~25 ms (+-ms jitter) fetch floor — slope noise
    # of +-20 us/call explains most of the r4 "NFM +-15% band" (one r5
    # rerun read 10.7 us, a 4x impossibility).  k_big*per >= ~30 ms keeps
    # the slope signal-dominated.
    per = time_kernel(lambda x: pipe.apply(st, x)[1], x, k_pair=(64, 512))
    return n / per / 1e6


def bench_tpu_ssb(chunks=270):
    """End-to-end SSB receiver (BASELINE config 4, reference README.md:110):
    fir_decimate_cc 50 | bandpass_fir_fft_cc 0 0.1 | realpart_cf | agc_ff |
    limit_ff.  Chunk must be a multiple of decimation * the bandpass
    fftfilt input_size."""
    from csdr_tpu import firdes
    from csdr_tpu.core import cplx
    from csdr_tpu.models import receivers
    from csdr_tpu.ops import fftfilt
    from csdr_tpu.utils.timing import time_kernel

    _, ins, _ = fftfilt.fftfilt_plan(firdes.firdes_filter_len(0.05))
    n = 50 * ins * chunks                     # ~2.4M samples, chunk-aligned
    rng = np.random.default_rng(0)
    x = cplx.from_numpy((rng.standard_normal(n) +
                         1j * rng.standard_normal(n)).astype(np.complex64))
    pipe = receivers.ssb_receiver()
    st = pipe.init()
    per = time_kernel(lambda x: pipe.apply(st, x)[1], x, k_pair=(16, 128))
    return n / per / 1e6


def bench_tpu_am(n=2_400_000):
    """End-to-end AM receiver (reference README.md:95): fir_decimate_cc 50
    | amdemod_cf | fastdcblock_ff | agc_ff | limit_ff.  NOTE: this chain
    wedged the axon worker twice in mid-r2 (pre column-major AGC); it ran
    clean on 2026-08-19 at 4 563 Msps — keep it subprocess-isolated."""
    from csdr_tpu.core import cplx
    from csdr_tpu.models import receivers
    from csdr_tpu.utils.timing import time_kernel

    rng = np.random.default_rng(0)
    x = cplx.from_numpy((rng.standard_normal(n) +
                         1j * rng.standard_normal(n)).astype(np.complex64))
    pipe = receivers.am_receiver()
    st = pipe.init()
    per = time_kernel(lambda x: pipe.apply(st, x)[1], x, k_pair=(16, 128))
    return n / per / 1e6


def bench_tpu_flagship(frames_target=3200):
    """BASELINE config 5 single-chip: 64-ch fastddc D=50 + 64 BPSK31
    Gardner/DBPSK modems.  ~5-7 min axon compile; runs by default as a
    subprocess-isolated secondary (CSDR_BENCH_FLAGSHIP=0 disables).
    Measured 1496 Msps wideband on 2026-08-20 (r4 fixed-margin TED carry
    + chunk depth 3200 = 128 classed GROUPS, an exact MXU tile row count
    for the per-class einsum; was 542 in r2/r3 — docs/ROUND4.md.  Depth
    curve: 1475/2950/3200/3700/4425 -> 947/1368-1390/1496/1310/1259)."""
    import jax
    from jax.sharding import Mesh
    from csdr_tpu.models import multichannel
    from csdr_tpu.core.cplx import CF
    from csdr_tpu.utils.timing import time_kernel
    import jax.numpy as jnp

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("chan", "time"))
    rng = np.random.default_rng(3)
    rates = rng.uniform(-0.35, 0.35, 64)
    # serial Gardner is the measured flagship winner (segmented and
    # sub-chunked modes both LOSE composed at this shape — docs/ROUND4.md);
    # the env knobs exist for A/B only
    segs = int(os.environ.get("CSDR_FLAGSHIP_SEGMENTS", "1"))
    subs = int(os.environ.get("CSDR_FLAGSHIP_SUBCHUNKS", "1"))
    init, step, meta = multichannel.build_ddc_bpsk31_bank(
        mesh, rates, 50, 256, tr_segments=segs, tr_subchunks=subs)
    q, ins = meta["q"], meta["input_size"]
    frames = (frames_target // q) * q
    n = frames * ins
    x = CF(jnp.asarray(rng.standard_normal(n), jnp.float32),
           jnp.asarray(rng.standard_normal(n), jnp.float32))
    state = init(n)
    per = time_kernel(lambda x, s: step(s, x)[1][0], x, aux=state,
                      k_pair=(4, 32))
    return n / per / 1e6


def _probe_device(max_wait_s: float = 480.0) -> bool:
    """The axon worker occasionally wedges (tiny ops hang; recovery takes
    10-40 min).  Probe with a watchdog and wait a bounded time so a bench
    launched into a wedge can still succeed, instead of hanging forever."""
    import threading
    import time as _t
    import jax
    import jax.numpy as jnp

    def once(timeout=60.0):
        out = {}

        def run():
            try:
                out["v"] = float(jax.device_get(jnp.sum(jnp.ones(8))))
            except Exception as e:   # noqa: BLE001
                out["e"] = e

        t = threading.Thread(target=run, daemon=True)
        t.start()
        t.join(timeout)
        return "v" in out

    deadline = _t.time() + max_wait_s
    while _t.time() < deadline:
        if once():
            return True
        sys.stderr.write("bench: device probe timed out (wedged axon "
                         "worker?) — waiting...\n")
        _t.sleep(30)
    return False


def _apply_onchip_gates():
    """Pallas kernel families that have never run on real silicon default
    OFF on the real TPU: a bad Mosaic kernel can wedge the axon worker for
    10-40+ min (CLAUDE.md "known wedgers") and the driver runs this bench
    unattended — losing every secondary after the wedge.
    bench_onchip_checklist.py writes ONCHIP_VALIDATED.json as its stages
    pass; once the marker certifies a family (stage 1 = matmul-FFT kernel
    goldens, stage 3 = axon golden suite incl. the fastddc vmem inverse),
    the gate lifts.  An explicit CSDR_FFT_KERNEL / CSDR_FASTDDC_KERNEL in
    the environment always wins.  The validated fallbacks (Stockham FFT,
    fused dense-matrix inverse) carry the mid-r2 measured numbers."""
    import jax
    if jax.default_backend() != "tpu":
        return
    marker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "ONCHIP_VALIDATED.json")
    passed: set = set()
    try:
        with open(marker) as f:
            passed = set(json.load(f).get("stages_passed", []))
    except Exception:  # noqa: BLE001 — absent/corrupt marker = not validated
        pass
    for var, need in (("CSDR_FFT_KERNEL", 1), ("CSDR_FASTDDC_KERNEL", 3)):
        if var not in os.environ and need not in passed:
            os.environ[var] = "0"
            sys.stderr.write(
                f"bench: {var}=0 — kernel family not yet certified on this "
                "chip (run bench_onchip_checklist.py to write "
                "ONCHIP_VALIDATED.json)\n")


def main():
    import os
    import signal
    import jax
    # sitecustomize preloads jax with the axon platform; honor an explicit
    # JAX_PLATFORMS (e.g. cpu smoke runs) the same way cli.main does
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    _apply_onchip_gates()
    # Total wall budget: the driver runs bench.py under its own timeout and
    # records the LAST parseable JSON line of the tail (r2 was killed at
    # rc=124 mid-secondary and the recorded metric was a stderr secondary,
    # not the headline).  Manage the budget ourselves: skip secondaries
    # that no longer fit, and ALWAYS re-print the headline as the final
    # stdout line — including on SIGTERM.
    # Default 2650: the r2/r3 driver runs both ended rc=124 — the driver's
    # own timeout (~3000 s, clocked from process EXEC) fired while the
    # self-budget (clocked from main(), i.e. after the 30-90 s axon jax
    # import) still had time left.  Leave that import + exit margin.
    t_start = time.time()
    budget_s = float(os.environ.get("CSDR_BENCH_BUDGET_S", "2650"))

    def remaining():
        return budget_s - (time.time() - t_start)

    headline = {"metric": "fir_decimate_cc throughput (D=10, 1023 taps)",
                "value": None, "unit": "complex Msamples/s/chip",
                "vs_baseline": None,
                "error": "bench terminated before the headline ran"}

    def _compact(rec):
        """The driver records bench.py's final stdout line from a ~2000-char
        tail capture; the r4 record came back `parsed: null` because the
        full roofline+secondaries record outgrew it (BENCH_r04.json).  The
        stdout contract is therefore a COMPACT line: headline fields +
        secondary VALUES (plus min/max spread where measured); full detail
        (roofline accounts, peaks, extras) goes to stderr and
        bench_detail.json."""
        c = {k: v for k, v in rec.items() if k not in ("roofline",
                                                       "secondaries")}
        secs = rec.get("secondaries")
        if secs:
            c["secondaries"] = {}
            for k, line in secs.items():
                if "min" in line and "max" in line:
                    c["secondaries"][k] = {"v": line["value"],
                                           "lo": line["min"],
                                           "hi": line["max"]}
                else:
                    c["secondaries"][k] = line["value"]
        return c

    def flush_headline(*_a):
        detail = json.dumps(headline)
        sys.stderr.write("bench detail: " + detail + "\n")
        try:
            path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "bench_detail.json")
            with open(path, "w") as f:
                f.write(detail + "\n")
        except Exception:  # noqa: BLE001 — detail file is best-effort
            pass
        print(json.dumps(_compact(headline)), flush=True)

    def on_term(signum, frame):  # driver timeout sends SIGTERM first
        sys.stderr.write("bench: SIGTERM — flushing headline and exiting\n")
        flush_headline()
        os._exit(0)

    signal.signal(signal.SIGTERM, on_term)
    if jax.default_backend() == "tpu" and not _probe_device(
            min(1800.0, max(120.0, budget_s * 0.5))):
        # Record the outage honestly rather than leaving no line at all:
        # the driver keeps the last stdout JSON line.  value=null marks
        # "not measured this run"; the pointer names the last real
        # measurement and where it is documented.
        sys.stderr.write("bench: TPU unavailable after wait\n")
        print(json.dumps({
            "metric": "fir_decimate_cc throughput (D=10, 1023 taps)",
            "value": None, "unit": "complex Msamples/s/chip",
            "vs_baseline": None,
            "error": "axon worker wedged for the whole probe window; "
                     "not measured this run. Last on-chip measurement "
                     "28352 Msps (2026-08-17, docs/BENCHMARKS_R2.md); "
                     "re-run `python bench.py` after recovery.",
        }), flush=True)
        return 1
    tpu, per = bench_tpu_fir_decimate()
    ref = bench_ref_fir_decimate()
    vs = (tpu / ref) if ref else None
    # roofline account (VERDICT r1 #1): measured chip ceilings + the
    # kernel's compulsory traffic and algorithmic MACs
    roof = None
    try:
        import jax
        if jax.default_backend() == "tpu":
            from csdr_tpu.utils import roofline
            peaks = {"device": jax.devices()[0].device_kind,
                     "hbm_bw_GBps": roofline.measure_hbm_bw() / 1e9,
                     "mxu_high_Tflops":
                         roofline.measure_mxu_flops("HIGH") / 1e12,
                     "vpu_Tflops": roofline.measure_vpu_flops() / 1e12}
            kout, d, t = 2048 * 128, 10, 1023   # matches bench_tpu_fir_decimate
            n = kout * d
            roof = roofline.account(
                "fir_decimate D=10 T=1023", per, 8.0 * (n + kout),
                4.0 * (127 * d + t) * kout, peaks, "HIGH",
                4.0 * t * kout)
            roof["peaks"] = peaks
    except Exception as e:  # roofline is reporting, never a bench failure
        sys.stderr.write(f"roofline accounting skipped: {e}\n")

    def _fastddc_account(decimation, channels, frames):
        """Extra-field hook for the channelizer secondaries: an algorithmic
        roofline account (VERDICT r1 #1 asks for pct_of_roofline on BOTH
        metric kernels) computed from the measured wideband Msps and the
        headline's already-measured chip peaks.  Compulsory traffic =
        input read once + channel outputs written once; algorithmic flops
        = fwd FFT (5 N log2 N per frame) + the folded inverse (fft/D
        complex MACs per channel output, 8 real flops each)."""
        def calc(v):
            if roof is None or v is None:
                return None
            import math
            from csdr_tpu.ops import fastddc as fd
            from csdr_tpu.utils import roofline
            ddc = fd.fastddc_init(0.05, decimation)
            n = frames * ddc.input_size
            per_s = n / (v * 1e6)
            fft, inv = ddc.fft_size, ddc.fft_inv_size
            out_per_frame = ddc.post_input_size / ddc.post_decimation
            f_fft = 5.0 * fft * math.log2(fft) * frames
            f_inv = (8.0 * frames * (fft / decimation)
                     * channels * out_per_frame)
            ideal = f_fft + f_inv
            vpu_fold = None
            if ddc.post_input_size % ddc.post_decimation == 0:
                # executed MACs of the fused-channelizer path: subsequence-
                # split DFT einsum + per-channel fold + shared iDFT
                mpad = fd.mpad_for(ddc)
                executed = (8.0 * frames * fft * inv
                            + 8.0 * frames * fft * channels
                            + 8.0 * channels * frames * inv * mpad)
                # the per-channel spectrum-taps fold cannot ride the MXU
                # (diagonal in the bin index): it is VPU work, and the
                # BINDING resource at high channel counts (r5 profile:
                # C=256 is fold-bound at ~40% of the measured VPU peak —
                # docs/ROUND5.md)
                vpu_fold = 8.0 * frames * fft * channels
            else:
                # classed path executed MACs: fwd matmul-FFT kernel
                # (dominated by the per-tile 128-point DFT matmuls) +
                # the per-class spectra einsum + the 0/1 compaction
                q, _t0s, _ms, m_max, _s = fd._class_plan(ddc)
                ga = q * ddc.post_input_size // ddc.post_decimation
                executed = (8.0 * frames * fft * 128
                            + 8.0 * frames * fft * channels * m_max
                            + 4.0 * channels * (frames / q)
                            * (q * m_max) * ga)
            byts = 8.0 * (n + frames * channels * out_per_frame)
            return roofline.account(
                f"fastddc D={decimation} C={channels}",
                per_s, byts, executed, roof["peaks"], "HIGH", ideal,
                vpu_flops=vpu_fold)
        return calc
    # the driver records the LAST stdout JSON line: print the proven
    # headline now (so it exists even if we die) AND again at exit
    rec = {
        "metric": "fir_decimate_cc throughput (D=10, 1023 taps)",
        "value": round(tpu, 1),
        "unit": "complex Msamples/s/chip",
        "vs_baseline": round(vs, 2) if vs else None,
    }
    if roof:
        rec["pct_of_roofline"] = roof["pct_of_roofline"]
        rec["roofline"] = roof
    headline.clear()
    headline.update(rec)
    sys.stderr.write("bench detail: " + json.dumps(rec) + "\n")
    print(json.dumps(_compact(rec)), flush=True)

    # secondary metrics -> stderr.  Each runs in a CHILD process with a
    # timeout: a kernel that wedges the axon worker (known failure mode —
    # CLAUDE.md "known wedgers") can then never hang bench.py past the
    # already-printed headline; the wedge costs one secondary's timeout.
    wedged = [False]    # once a secondary times out AND a probe fails,
                        # skip the rest: each would burn its full timeout

    def secondary(name, key, timeout_s, min_s=300, **extra):
        """min_s: the metric's known floor (compile + one measurement) —
        launching with less than this guarantees a futile TimeoutExpired
        that burns the remaining budget (the flagship alone compiles
        ~5-7 min TWICE), so skip instead."""
        import subprocess
        if wedged[0]:
            sys.stderr.write(json.dumps(
                {"metric": name, "error": "skipped: worker wedged"}) + "\n")
            return None
        if remaining() < min(timeout_s, min_s) + 60:
            sys.stderr.write(json.dumps(
                {"metric": name, "error": "skipped: bench wall budget "
                 f"exhausted ({remaining():.0f}s left)"}) + "\n")
            return None
        timeout_s = min(timeout_s, remaining() - 60)

        def attempt(extra_env=None):
            # re-check the wall budget per attempt: the kernel-gate retry
            # must not let one secondary spend ~2x its clamped timeout and
            # overrun budget_s (losing every remaining secondary to the
            # driver's own SIGTERM)
            t_left = remaining() - 60
            if t_left < min(timeout_s, min_s):
                raise RuntimeError("budget exhausted before attempt")
            env = dict(os.environ, **(extra_env or {}))
            t_child = min(timeout_s, t_left)
            # let the child pace its spread reps against the real window
            env.setdefault("CSDR_BENCH_CHILD_BUDGET_S", str(int(t_child)))
            p = subprocess.run(
                [sys.executable, __file__, "--run-secondary", key],
                capture_output=True, text=True,
                timeout=t_child, env=env)
            sys.stderr.write(p.stderr)
            if p.returncode != 0:
                raise RuntimeError(f"rc={p.returncode}")
            last = p.stdout.strip().splitlines()[-1]
            try:        # spread protocol: {"value":median,"min":..,"max":..}
                rec = json.loads(last)
                if not isinstance(rec, dict):
                    raise ValueError
                return rec
            except ValueError:
                return {"value": float(last)}

        try:
            try:
                rec = attempt()
            except subprocess.TimeoutExpired:
                # wedge or compile overrun? a tiny-op probe distinguishes
                if (jax.default_backend() == "tpu"
                        and not _probe_device(max_wait_s=90)):
                    wedged[0] = True
                raise
            except Exception:
                # e.g. a Mosaic compile failure on a kernel path: retry on
                # the validated Stockham fallback rather than losing the row
                sys.stderr.write(f"bench: {key} failed; retrying with "
                                 "CSDR_FFT_KERNEL=0 CSDR_FASTDDC_KERNEL=0\n")
                rec = attempt({"CSDR_FFT_KERNEL": "0",
                               "CSDR_FASTDDC_KERNEL": "0"})
            v = rec["value"]
            line = {"metric": name, "value": round(v, 1),
                    "unit": "complex Msamples/s/chip"}
            for sk in ("min", "max", "reps"):
                if sk in rec:
                    line[sk] = (round(rec[sk], 1) if sk != "reps"
                                else rec[sk])
            for k, f in extra.items():
                line[k] = f(v)
            sys.stderr.write(json.dumps(line) + "\n")
            headline.setdefault("secondaries", {})[key] = line
            return v
        except Exception as e:  # noqa: BLE001 — report, never kill the bench
            sys.stderr.write(json.dumps({"metric": name,
                                         "error": repr(e)}) + "\n")
            return None

    secondary("WFM advanced receiver end-to-end", "wfm", 1800,
              x_realtime_2p4Msps=lambda v: round(v / 2.4, 0))
    secondary("SSB receiver end-to-end", "ssb", 1500,
              x_realtime_2p4Msps=lambda v: round(v / 2.4, 0))
    # configs 1 and 3 round out all five BASELINE workloads in the driver
    # record; both are small-compile chains (~1 min)
    secondary("WFM basic receiver (240 ksps demod chain)", "wfm_basic", 900,
              x_realtime_240ksps=lambda v: round(v / 0.24, 0))
    secondary("NFM receiver end-to-end", "nfm", 900,
              x_realtime_2p4Msps=lambda v: round(v / 2.4, 0))
    # frames=2500 -> 100 rows per class matmul: the classed inverse is
    # MXU-efficiency-bound, and skinny-M (frames/25-row) matmuls were the
    # round-1 limiter (505 -> ~1700 Msps)
    secondary("fastddc 64-channel D=50 (phase-classed inverse)",
              "fastddc50", 1800,
              roofline=_fastddc_account(50, 64, 2500))
    if os.environ.get("CSDR_BENCH_FLAGSHIP", "1") != "0":
        # ~5-7 min axon compile before the first step runs; subprocess
        # isolation + the wedge probe make it safe to run by default
        # time_kernel compiles TWO fori-loop wrappers of the flagship graph
        # (k_pair), each a ~5-7 min axon compile: budget generously
        secondary("flagship 64ch fastddc D=50 + BPSK31 modems",
                  "flagship", 2400, min_s=1500,
                  x_realtime_2p4Msps=lambda v: round(v / 2.4, 0))
    ddc_ref1 = bench_ref_fastddc()
    # the reference serves 64 channels with 1 fwd + 64 inv processes; its
    # wideband rate is bounded by the per-channel pipeline rate / ~64.
    secondary("fastddc 64-channel channelizer wideband throughput",
              "fastddc16", 1800,
              ref_1ch_cpu_Msps=lambda v: (round(ddc_ref1, 1)
                                          if ddc_ref1 else None),
              vs_baseline_64ch=lambda v: (round(v / (ddc_ref1 / 64), 1)
                                          if ddc_ref1 else None),
              roofline=_fastddc_account(16, 64, 1024))
    secondary("fastddc 256-channel channelizer wideband throughput",
              "fastddc256", 1500,
              roofline=_fastddc_account(16, 256, 512))
    # AM runs LAST: wedge events have clustered around AM-chain benches
    # (3 of 8 observed, incl. one clean standalone run — probabilistic at
    # most, but a wedge here must not cost the higher-value metrics above)
    secondary("AM receiver end-to-end", "am", 1500,
              x_realtime_2p4Msps=lambda v: round(v / 2.4, 0))
    # the LAST stdout line is what the driver records: the headline, now
    # carrying every completed secondary
    flush_headline()


_SECONDARIES = {
    "wfm": bench_tpu_wfm,
    "wfm_basic": bench_tpu_wfm_basic,
    "nfm": bench_tpu_nfm,
    "ssb": bench_tpu_ssb,
    "am": bench_tpu_am,
    # frames=3200 -> 128 phase-class groups: exact MXU tile rows for the
    # classed einsum (2 382 vs 2 032 Msps at 2500 — r4 tiling sweep)
    "fastddc50": lambda: bench_tpu_fastddc(decimation=50, frames=3200),
    "flagship": bench_tpu_flagship,
    "fastddc16": bench_tpu_fastddc,
    "fastddc256": lambda: bench_tpu_fastddc(channels=256, frames=512),
}


# the two metrics with observed run-to-run bands (flagship ±7%, NFM ±15% —
# docs/ROUND4.md "device-state variance") report median-of-3 with min/max;
# repeats reuse the in-process compile cache so each extra rep costs only
# run time, not the 5-7 min flagship compile (reference discipline:
# test200.c:42-124, 200 iterations per kernel)
_REPS = {"flagship": 3, "nfm": 3}


def _run_secondary(key: str) -> int:
    """Child entry: honor JAX_PLATFORMS like main(), run one metric, print
    the result on the LAST stdout line (parent parses JSON-or-float)."""
    import os
    import statistics
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    reps = _REPS.get(key, 1) if not os.environ.get("CSDR_TIMING_SMOKE") else 1
    budget = float(os.environ.get("CSDR_BENCH_CHILD_BUDGET_S", "1e9"))
    t0 = time.time()
    vals = []
    for i in range(reps):
        t_rep = time.time()
        vals.append(float(_SECONDARIES[key]()))
        rep_cost = time.time() - t_rep
        # drop reps, not the metric: stop if another rep (sans the first
        # rep's compile share, so ~ this rep's wall) won't fit the window
        if i + 1 < reps and (time.time() - t0) + 1.3 * rep_cost > budget * 0.85:
            sys.stderr.write(f"bench: {key} spread stopped at {i + 1} reps "
                             "(child budget)\n")
            break
    if len(vals) == 1:
        print(vals[0])
    else:
        print(json.dumps({"value": statistics.median(vals),
                          "min": min(vals), "max": max(vals),
                          "reps": len(vals)}))
    return 0


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--run-secondary":
        sys.exit(_run_secondary(sys.argv[2]))
    sys.exit(main() or 0)
