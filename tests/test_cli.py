"""CLI parity: drive `python -m csdr_tpu.cli` with raw byte pipes exactly
like the reference's own shell pipelines (SURVEY.md §4 test strategy)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from tests.util import refbind, assert_snr, cplx_noise

ENV = dict(os.environ, JAX_PLATFORMS="cpu", CSDR_TPU_TEST_PLATFORM="cpu")


def run_cli(args, stdin_bytes, timeout=180):
    p = subprocess.run(
        [sys.executable, "-m", "csdr_tpu.cli", *args],
        input=stdin_bytes, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        timeout=timeout, env=ENV, cwd=os.path.dirname(os.path.dirname(__file__)))
    assert p.returncode == 0, p.stderr.decode()[-2000:]
    return p.stdout


def test_convert_roundtrip():
    raw = np.random.default_rng(0).integers(0, 256, 4096).astype(np.uint8)
    f = run_cli(["convert_u8_f"], raw.tobytes())
    back = run_cli(["convert_f_u8"], f)
    np.testing.assert_array_equal(np.frombuffer(back, np.uint8),
                                  raw)


def test_cli_fir_decimate_matches_reference():
    x = cplx_noise(40960, seed=1)
    out = run_cli(["fir_decimate_cc", "10", "0.05", "HAMMING"], x.tobytes())
    ours = np.frombuffer(out, np.complex64)
    from csdr_tpu import firdes
    # the CLI now drops the zero-history warmup output, so the wire
    # stream aligns 1:1 with the reference's valid-mode convention
    taps = firdes.firdes_lowpass_f(firdes.firdes_filter_len(0.05), 0.05)
    ref = refbind.fir_decimate_cc(x, taps, 10)
    m = min(len(ref), len(ours))
    assert m > 3000
    assert_snr(ref[:m], ours[:m], 95, "cli fir_decimate")


def test_cli_shift_and_gain():
    x = cplx_noise(8192, seed=2)
    out = run_cli(["shift_math_cc", "0.2"], x.tobytes())
    ours = np.frombuffer(out, np.complex64)
    ref, _ = refbind.shift_math_cc(x, 0.2)
    assert_snr(ref[: len(ours)], ours, 60, "cli shift")

    f = np.random.default_rng(3).standard_normal(1024).astype(np.float32)
    out = run_cli(["gain_ff", "2.5"], f.tobytes())
    np.testing.assert_allclose(np.frombuffer(out, np.float32), f * 2.5, rtol=1e-6)


def test_cli_psk31_chain_roundtrip():
    text = b"CQ CQ DE CSDR TPU K " * 8
    bits = run_cli(["psk31_varicode_encoder_u8_u8"], text)
    enc = run_cli(["differential_encoder_u8_u8"], bits)
    sym = run_cli(["psk_modulator_u8_c", "2"], enc)
    bb = run_cli(["psk31_interpolate_sine_cc", "64"], sym)
    rec = run_cli(["timing_recovery_cc", "GARDNER", "64", "0.5", "2", "--add_q"], bb)
    outbits = run_cli(["dbpsk_decoder_c_u8"], rec)
    a = np.frombuffer(bits, np.uint8)
    b = np.frombuffer(outbits, np.uint8)
    best = min(
        int(np.sum(a[: len(b) - s] != b[s: s + len(a)][: len(a[: len(b) - s])]))
        for s in range(0, 4))
    assert best <= len(a) * 0.01, best


def test_cli_unknown_command():
    p = subprocess.run([sys.executable, "-m", "csdr_tpu.cli", "not_a_command"],
                       input=b"", stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                       env=ENV, timeout=60,
                       cwd=os.path.dirname(os.path.dirname(__file__)))
    assert p.returncode != 0
    assert b"unknown command" in p.stderr
