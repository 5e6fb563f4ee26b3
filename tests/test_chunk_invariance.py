"""Chunk-size invariance: streaming a given input through a CLI command must
produce byte-identical output regardless of CSDR_FIXED_BUFSIZE.

This is the regression net for the bug class the round-2 review sweeps kept
finding by hand (carry state lost/corrupted at chunk boundaries: FIR tails,
NCO phase, AGC hang, decimator backlog, overlap-add tails, decoder shift
windows).  The reference gets this property for free per-op (every libcsdr
function takes explicit carry state and csdr.c feeds contiguous buffers);
here the Block state pytree has to reproduce it across jit boundaries.

Commands whose OUTPUT depends on the buffer size BY DESIGN are excluded
below with the reason (fastagc_ff's window is bufsize/2 in the reference,
csdr.c:1377-1386; squelch computes power per buffer, csdr.c:2192-2243; ...).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from tests.test_cli_smoke import CASES

# chunk-sensitive by DESIGN (reference semantics) or not input-driven
EXCLUDE = {
    "fastagc_ff": "window = bufsize/2 in the reference (csdr.c:1377)",
    "squelch_and_smeter_cc": "power/report cadence is per-buffer",
    "flowcontrol": "wall-clock pacing, per-buffer sleeps",
    "through": "stderr rate meter only; stdout invariant but timing text",
    "normalized_timing_variance_u32_f": "variance printed per buffer",
    "yes_f": "source, ignores stdin",
    "firdes_lowpass_f": "no stdin",
    "firdes_bandpass_c": "no stdin",
    "firdes_peak_c": "no stdin",
    "firdes_pulse_shaping_filter_f": "no stdin",
    "shift_addition_cc_test": "self-test, no stdin",
    "awgn_cc": "fresh random seed per process",
    "--help": "not a stream command",
    "fifo": "drop-oldest under load is timing-dependent",
    "tee": "async writer cadence",
    "octave_complex_c": "one gnuplot frame per BUFFER in the reference",
    "_fft2octave": "plot framing tied to buffer cadence",
    "fft_benchmark": "not a stream command",
    "dump_f": "text format invariant but slow; covered by dump goldens",
    "dump_u8": "covered by dump goldens",
    "compress_fft_adpcm_f_u8":
        "reference pads/encodes per BUFFER (csdr.c:1745-1768, "
        "COMPRESS_FFT_PAD_N per read)",
    "fastdcblock_ff":
        "the DC-estimate window IS the buffer (libcsdr.c:920-941 averages "
        "each block)",
}

# float32 streams where the compute path legitimately differs per chunk
# shape at float-reordering level (matmul tiling, the chunked-AGC
# relaxation, carried f32 NCO phase): compare as f32 with tight tolerance
# instead of raw bytes.  Anything structural (lost/duplicated samples,
# state resets) still fails: those show up as length mismatches or O(1)
# deltas.
F32_CLOSE = {
    "agc_ff",                     # chunked relaxation reorders float ops
    "simple_agc_cc",              # affine-scan assoc. reordering
    "dcblock_ff",                 # associative-scan reordering
    "bfsk_demod_cf",              # FIR matmul tiling
    "deemphasis_nfm_ff", "deemphasis_wfm_ff",
    "fractional_decimator_ff",    # phase-classed slab matmul tiling
    "peaks_fir_cc", "pulse_shaping_filter_cc",
    "fmmod_fc",                   # f32 phase cumsum carry
    "shift_math_cc", "shift_addition_cc", "shift_table_cc",
    "shift_addfast_cc", "shift_unroll_cc", "shift_addition_fc",
    "decimating_shift_addition_cc",   # f32 phase carry (digit-split NCO)
}

SIZES = (512, 1459)  # one power-of-two-ish, one odd prime-ish


def _run(name, args, inp, bufsize):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               CSDR_FIXED_BUFSIZE=str(bufsize))
    r = subprocess.run([sys.executable, "-m", "csdr_tpu.cli", name] + args,
                       input=inp, capture_output=True, timeout=300, env=env)
    assert r.returncode == 0, (name, bufsize, r.stderr.decode()[-400:])
    return r.stdout


def _cases():
    for name in sorted(CASES):
        if name in EXCLUDE:
            continue
        yield name


@pytest.mark.parametrize("name", list(_cases()))
def test_chunk_invariance(name):
    args, inp, _expect = CASES[name]
    if not inp:
        pytest.skip("no canned input")
    outs = [_run(name, args, inp, s) for s in SIZES]
    if name in F32_CLOSE:
        a, b = (np.frombuffer(o, np.float32) for o in outs)
        assert len(a) == len(b), (name, len(a), len(b))
        assert len(a) > 0
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=5e-4)
    else:
        assert outs[0] == outs[1], (
            f"{name}: output differs between CSDR_FIXED_BUFSIZE={SIZES[0]} "
            f"and {SIZES[1]} ({len(outs[0])} vs {len(outs[1])} bytes)")
