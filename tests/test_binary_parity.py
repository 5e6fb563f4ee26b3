"""End-to-end BINARY parity: the reference `csdr` executable (compiled from
/root/reference with the local fftw shim) vs `python -m csdr_tpu.cli`, fed
identical bytes with identical CSDR_FIXED_BUFSIZE.

This is one level above the refbind ctypes goldens: it exercises the real
dispatcher, argv parsing, env handling, and stream pump of BOTH programs.

Reference EOF quirk accounted for: csdr.c's loop does FEOF_CHECK before
fread and always fwrites the full buffer, so the final (post-EOF) buffer
repeats stale data — comparison is restricted to the valid prefix (exactly
n outputs for the 1:1-rate commands tested here).
"""

import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

HERE = pathlib.Path(__file__).parent
REF = pathlib.Path("/root/reference")
BIN = HERE / "ref" / ".ref_build" / "ref_csdr"

N = 4096
BUFSIZE = 512
RNG = np.random.default_rng(7)
F32 = (0.3 * RNG.standard_normal(N)).astype(np.float32)
CF64 = (0.3 * (RNG.standard_normal(N) + 1j * RNG.standard_normal(N))
        ).astype(np.complex64)
S16 = RNG.integers(-9000, 9000, N).astype(np.int16)
U8 = RNG.integers(0, 256, N).astype(np.uint8)


def _build():
    if BIN.exists():
        srcs = [REF / "csdr.c", REF / "libcsdr_wrapper.c",
                REF / "fft_fftw.c", HERE / "ref" / "fftw_shim.c"]
        if BIN.stat().st_mtime > max(s.stat().st_mtime for s in srcs):
            return BIN
    BIN.parent.mkdir(parents=True, exist_ok=True)
    cmd = ["gcc", "-O2", "-std=gnu99", "-include", "stdio.h",
           "-D_GNU_SOURCE", "-DUSE_FFTW", "-DLIBCSDR_GPL",
           "-DUSE_IMA_ADPCM", "-Wno-unused-result",
           "-I", str(HERE / "ref"), "-I", str(REF),
           str(REF / "csdr.c"), str(REF / "libcsdr_wrapper.c"),
           str(REF / "fft_fftw.c"), str(HERE / "ref" / "fftw_shim.c"),
           "-lm", "-lrt", "-lpthread", "-o", str(BIN)]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return BIN


@pytest.fixture(scope="module")
def ref_bin():
    try:
        return _build()
    except subprocess.CalledProcessError as e:  # pragma: no cover
        pytest.skip(f"reference csdr binary build failed: {e.stderr[-400:]}")


def _run(argv0, args, inp: bytes) -> bytes:
    env = dict(os.environ, CSDR_FIXED_BUFSIZE=str(BUFSIZE),
               JAX_PLATFORMS="cpu")
    r = subprocess.run(list(argv0) + args, input=inp, capture_output=True,
                       timeout=300, env=env)
    assert r.returncode == 0, (args, r.returncode, r.stderr.decode()[-300:])
    return r.stdout


# 1:1-rate commands: (args, input bytes, out dtype, SNR dB or None for
# bit-exact).  u8_f/s16_f are SNR-compared at 120 dB: the reference does
# the scale arithmetic in double (C promotion) before the float store, a
# 1-ULP difference we accept.
CASES = {
    "convert_u8_f": ([], U8.tobytes(), np.float32, 120.0),
    "convert_f_s16": ([], F32.tobytes(), np.int16, None),
    "convert_s16_f": ([], S16.tobytes(), np.float32, 120.0),
    "realpart_cf": ([], CF64.tobytes(), np.float32, None),
    "gain_ff": (["1.7"], F32.tobytes(), np.float32, None),
    "limit_ff": (["0.2"], F32.tobytes(), np.float32, None),
    "shift_addition_cc": (["0.1"], CF64.tobytes(), np.float32, 70.0),
    "fmdemod_quadri_cf": ([], CF64.tobytes(), np.float32, 60.0),
    "amdemod_cf": ([], CF64.tobytes(), np.float32, 80.0),
    "deemphasis_wfm_ff": (["48000", "50e-6"], F32.tobytes(), np.float32,
                          80.0),
    "agc_ff": ([], F32.tobytes(), np.float32, 55.0),
    "dsb_fc": ([], F32.tobytes(), np.float32, None),
    "fastdcblock_ff": ([], F32.tobytes(), np.float32, 70.0),
    "invert_u8_u8": ([], (U8 & 1).tobytes(), np.uint8, None),
    "differential_encoder_u8_u8": ([], (U8 & 1).tobytes(), np.uint8, None),
    "encode_ima_adpcm_i16_u8": ([], S16.tobytes(), np.uint8, None),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_binary_parity(name, ref_bin):
    args, inp, dt, snr = CASES[name]
    ref = np.frombuffer(_run([str(ref_bin)], [name] + args, inp), dt)
    ours = np.frombuffer(
        _run([sys.executable, "-m", "csdr_tpu.cli"], [name] + args, inp), dt)
    # valid prefix length: n outputs at 1:1 rate (ADPCM halves; the
    # reference's post-EOF stale buffer is excluded)
    n_valid = min(len(ours), len(ref))
    if name.startswith("encode_ima"):
        n_valid = min(n_valid, N // 2)
    elif name == "agc_ff":
        # DOCUMENTED deviation past the first buffer: the reference resets
        # hang/peak and skips sample 0 per BUFFER (C locals,
        # libcsdr_gpl.c:190-198); we carry the full recurrence state for
        # chunk-size invariance.  Identical within the first buffer.
        n_valid = min(n_valid, BUFSIZE)
    else:
        n_valid = min(n_valid, N)
    assert n_valid > 0
    a, b = ref[:n_valid].astype(np.float64), ours[:n_valid].astype(np.float64)
    if snr is None:
        np.testing.assert_array_equal(a, b, err_msg=name)
    else:
        num = float(np.sum(a * a))
        den = float(np.sum((a - b) ** 2)) + 1e-30
        got = 10 * np.log10(num / den + 1e-30)
        assert got >= snr, (name, got)


def test_dynamic_bufsize_preamble(ref_bin):
    """CSDR_DYNAMIC_BUFSIZE_ON: both programs emit the 8-byte 'csdr' +
    u32 bufsize preamble (csdr.c:325-392) and equivalent payload."""
    env = dict(os.environ, CSDR_DYNAMIC_BUFSIZE_ON="1", JAX_PLATFORMS="cpu")
    env.pop("CSDR_FIXED_BUFSIZE", None)
    inp = F32.tobytes()
    outs = {}
    for key, argv0 in (("ref", [str(ref_bin)]),
                       ("ours", [sys.executable, "-m", "csdr_tpu.cli"])):
        r = subprocess.run(argv0 + ["gain_ff", "2.0"], input=inp,
                           capture_output=True, timeout=300, env=env)
        assert r.returncode == 0, (key, r.stderr.decode()[-300:])
        out = r.stdout
        assert out[:4] == b"csdr", (key, out[:8])
        bs = int(np.frombuffer(out[4:8], np.uint32)[0])
        assert bs > 0
        outs[key] = np.frombuffer(out[8:], np.float32)
    n = min(len(outs["ref"]), len(outs["ours"]), N)
    np.testing.assert_array_equal(outs["ref"][:n], outs["ours"][:n])
