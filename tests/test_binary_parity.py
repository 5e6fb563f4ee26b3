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
    "differential_decoder_u8_u8": ([], (U8 & 1).tobytes(), np.uint8, None),
    "encode_ima_adpcm_i16_u8": ([], S16.tobytes(), np.uint8, None),
    "fmdemod_atan_cf": ([], CF64.tobytes(), np.float32, 60.0),
    "dcblock_ff": ([], F32.tobytes(), np.float32, 70.0),
    "binary_slicer_f_u8": ([], F32.tobytes(), np.uint8, None),
    "convert_f_u8": ([], F32.tobytes(), np.uint8, None),
    "convert_s8_f": ([], U8.tobytes(), np.float32, 120.0),
    "convert_f_s8": ([], F32.tobytes(), np.int8, None),
    "convert_f_s24": ([], (F32 * 0.9).tobytes(), np.uint8, None),
    "simple_agc_cc": (["0.01"], CF64.tobytes(), np.float32, 60.0),
    # 55 dB: bounded by the REFERENCE's own trig-recurrence drift
    # (libcsdr_gpl.c:54-79 has no periodic correction, unlike the cc
    # variant); our direct NCO is -132 dB vs the f64 oracle
    "shift_addition_fc": (["0.17"], F32.tobytes(), np.float32, 55.0),
    "psk31_varicode_encoder_u8_u8": ([], b"HELLO WORLD csdr tpu 123\n" * 8,
                                     np.uint8, None),
}

# rate-changing commands: compare the overlapping prefix at SNR — any
# count/framing mismatch destroys alignment and fails loudly
RATE_CASES = {
    "fir_decimate_cc": (["4", "0.05", "HAMMING"], CF64.tobytes(),
                        np.float32, 90.0),
    "fir_interpolate_cc": (["4", "0.05", "HAMMING"], CF64.tobytes(),
                           np.float32, 90.0),
    "rational_resampler_ff": (["5", "2"], F32.tobytes(), np.float32, 90.0),
    "fractional_decimator_ff": (["2.5"], F32.tobytes(), np.float32, 80.0),
    "logpower_cf": (["0"], CF64.tobytes(), np.float32, 90.0),
    "fft_cc": (["256", "256"], CF64.tobytes(), np.float32, 90.0),
    "bandpass_fir_fft_cc": (["0.0", "0.2", "0.05"], CF64.tobytes(),
                            np.float32, 80.0),
    "decode_ima_adpcm_u8_i16": ([], (U8 % 16).tobytes(), np.int16, 80.0),
    "psk31_interpolate_sine_cc": (["8"], CF64.tobytes(), np.float32, 90.0),
    "deemphasis_nfm_ff": (["48000"], F32.tobytes(), np.float32, 80.0),
}


@pytest.mark.parametrize("name", sorted(RATE_CASES))
def test_binary_parity_rate(name, ref_bin):
    args, inp, dt, snr = RATE_CASES[name]
    ref = np.frombuffer(_run([str(ref_bin)], [name] + args, inp), dt)
    ours = np.frombuffer(
        _run([sys.executable, "-m", "csdr_tpu.cli"], [name] + args, inp), dt)
    if name == "deemphasis_nfm_ff":
        # upstream quirk: `processed` starts 0, so the first iteration
        # freads NOTHING and valid-filters the zero-initialized buffer —
        # the reference stream is effectively [bufsize zeros | x] in valid
        # mode.  Our 1:1 zero-history form: ours[k+T-1] == ref[bufsize+k].
        ref = ref[BUFSIZE:]
        ours = ours[200:]          # taps_length-1 for the 201-tap table
    if name == "fir_interpolate_cc":
        # upstream BUG, not semantics: the reference's interpolate loop has
        # no initial FREAD_C (csdr.c fir_interpolate_cc, unlike
        # fir_decimate_cc), so its first iteration interpolates the
        # UNINITIALIZED input buffer — one accidental buffer of
        # interpolated zero-page content before any real input.  Skip it;
        # the streams align one-to-one after.
        ref = ref[2 * BUFSIZE * 4:]
    # both sides may append warmup-tail or post-EOF garbage; compare the
    # overlapping prefix minus the reference's final (possibly stale)
    # buffer's worth of output
    n_valid = min(len(ref), len(ours))
    n_valid -= min(n_valid // 4, 2 * BUFSIZE)
    assert n_valid > 256, (name, len(ref), len(ours))
    a = ref[:n_valid].astype(np.float64)
    b = ours[:n_valid].astype(np.float64)
    num = float(np.sum(a * a))
    den = float(np.sum((a - b) ** 2)) + 1e-30
    got = 10 * np.log10(num / den + 1e-30)
    assert got >= snr, (name, got, len(ref), len(ours))


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


def test_chain_wfm_receiver(ref_bin):
    """Whole-receiver parity: the reference README's WFM chain
    (fir_decimate 10 | fmdemod_quadri | fractional_decimator 5 |
    deemphasis_wfm | convert_f_s16) run as a REAL shell pipeline through
    both programs on the same synthetic FM capture."""
    fs = 2_400_000
    n = fs // 8
    t = np.arange(n) / fs
    audio = 0.4 * np.sin(2 * np.pi * 1000 * t)
    phase = 2 * np.pi * np.cumsum(audio) * 75_000 / fs
    iq = np.exp(1j * phase).astype(np.complex64)

    chain = [["fir_decimate_cc", "10", "0.05", "HAMMING"],
             ["fmdemod_quadri_cf"],
             ["fractional_decimator_ff", "5"],
             ["deemphasis_wfm_ff", "48000", "50e-6"],
             ["convert_f_s16"]]

    def run_chain(argv0):
        env = dict(os.environ, CSDR_FIXED_BUFSIZE=str(BUFSIZE),
                   JAX_PLATFORMS="cpu")
        data = iq.tobytes()
        for stage in chain:
            r = subprocess.run(argv0 + stage, input=data,
                               capture_output=True, timeout=600, env=env)
            assert r.returncode == 0, (stage, r.stderr.decode()[-300:])
            data = r.stdout
        return np.frombuffer(data, np.int16)

    ref = run_chain([str(ref_bin)])
    ours = run_chain([sys.executable, "-m", "csdr_tpu.cli"])
    n_valid = min(len(ref), len(ours))
    n_valid -= min(n_valid // 4, 4 * BUFSIZE)   # ref post-EOF stale buffers
    assert n_valid > 2000, (len(ref), len(ours))
    a = ref[:n_valid].astype(np.float64)
    b = ours[:n_valid].astype(np.float64)
    snr = 10 * np.log10(float(np.sum(a * a))
                        / (float(np.sum((a - b) ** 2)) + 1e-30) + 1e-30)
    assert snr >= 40.0, snr   # s16 audio; the chains agree to ~LSB noise


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
