"""Tests for the long-tail parity CLI commands and their ops, golden-checked
against the reference where a reference implementation exists
(tee/fifo/flowcontrol/dump/rtty/plain_interpolate/firdes_peak_c/
shift_addition_fc/octave plotting/syncword_search)."""

import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "ref"))
import refbind  # noqa: E402


def run(cmd, inp=b"", timeout=300):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run([sys.executable, "-m", "csdr_tpu.cli"] + cmd,
                          input=inp, capture_output=True, timeout=timeout,
                          env=env)


def test_firdes_peak_c_golden():
    from csdr_tpu import firdes
    for rates in ([0.1], [0.05, -0.2]):
        ours = firdes.firdes_add_peak_c(57, rates)
        ref = refbind.firdes_add_peak_c(57, rates)
        np.testing.assert_allclose(np.asarray(ours, np.complex64), ref,
                                   rtol=0, atol=2e-6)


def test_rtty_baudot2ascii_golden():
    rng = np.random.default_rng(7)
    codes = rng.integers(0, 32, 200).astype(np.uint8)
    ref, ref_mode = refbind.rtty_baudot_decoder_lookup(codes)
    from csdr_tpu.ops import digital
    out, mode = digital.rtty_baudot2ascii_u8_u8(codes)
    got = bytes(np.asarray(out.data)[: int(out.count)])
    assert got == ref
    assert int(mode) == ref_mode


def test_rtty_baudot2ascii_carry():
    """fig_mode must carry across block boundaries."""
    from csdr_tpu.ops import digital
    codes = np.array([0b11011, 0b11101, 0b11111, 0b00101], np.uint8)  # FIG 1 LTR H
    o1, m = digital.rtty_baudot2ascii_u8_u8(codes[:2])
    o2, m = digital.rtty_baudot2ascii_u8_u8(codes[2:], m)
    text = bytes(np.asarray(o1.data)[: int(o1.count)]) + \
        bytes(np.asarray(o2.data)[: int(o2.count)])
    assert text == b"1H"


def test_rtty_line_decoder_golden():
    rng = np.random.default_rng(3)
    # framed stream: idle 1s, start 0, 5 bits, stop 1s — plus random junk
    symbols = []
    for code in rng.integers(0, 32, 40):
        symbols += [1, 1, 0] + [(int(code) >> (4 - i)) & 1 for i in range(5)]
    symbols += [1, 1]
    ref = refbind.rtty_baudot_decoder_push(symbols)
    r = run(["rtty_line_decoder_u8_u8"], bytes(symbols))
    assert r.stdout == ref, (r.stdout, ref)


def test_plain_interpolate_cc():
    x = (np.arange(10) + 1j * np.arange(10)).astype(np.complex64)
    r = run(["plain_interpolate_cc", "4"], x.tobytes())
    y = np.frombuffer(r.stdout, np.complex64).reshape(10, 4)
    np.testing.assert_array_equal(y[:, 0], x)
    assert not y[:, 1:].any()


def test_shift_addition_fc():
    x = np.ones(32, np.float32)
    r = run(["shift_addition_fc", "0.25"], x.tobytes())
    y = np.frombuffer(r.stdout, np.complex64)
    np.testing.assert_allclose(y[:4], [1, 1j, -1, -1j], atol=1e-5)


def test_fifo_tee_flowcontrol_dumps():
    payload = bytes(range(256)) * 16
    assert run(["fifo", "64", "128"], payload).stdout == payload
    with tempfile.NamedTemporaryFile(delete=False) as tf:
        path = tf.name
    try:
        r = run(["tee", path], payload)
        assert r.stdout == payload and open(path, "rb").read() == payload
    finally:
        os.unlink(path)
    assert run(["flowcontrol", "409600", "100"], payload).stdout == payload
    f = np.array([1.5, -2.0], np.float32)
    assert run(["dump_f"], f.tobytes()).stdout.startswith(b"1.5 -2 ")
    assert run(["dump_u8"], b"\x0f\xa0").stdout.startswith(b"0f a0")
    assert run(["none"], payload).returncode == 0


def test_old_fractional_decimator_matches_streaming():
    """Streaming CLI output == one-shot op output (carry correctness)."""
    from csdr_tpu.ops import resamp
    rng = np.random.default_rng(0)
    x = rng.standard_normal(70000).astype(np.float32)
    y_once, used, _ = resamp.old_fractional_decimator_ff(x, 2.2)
    r = run(["old_fractional_decimator_ff", "2.2"], x.tobytes())
    y_cli = np.frombuffer(r.stdout, np.float32)
    n = min(len(y_cli), len(y_once))
    assert n > 25000
    np.testing.assert_allclose(y_cli[:n], np.asarray(y_once)[:n], atol=1e-5)


def test_syncword_search():
    bits = np.array([0, 1] * 10 + [1, 0, 1, 0, 1, 1, 1, 1] +
                    [1, 0, 1, 1, 0, 0, 1, 0], np.uint8)
    r = run(["syncword_search", "af", "8"], bits.tobytes())
    assert list(np.frombuffer(r.stdout, np.uint8))[-8:] == [1, 0, 1, 1, 0, 0, 1, 0]


def test_octave_outputs():
    x = np.arange(32, dtype=np.float32).view(np.complex64)
    r = run(["octave_complex_c", "4", "8", "--2d"], x.tobytes())
    assert b"subplot(2,1,1)" in r.stdout and r.stdout.count(b"N = 4") == 2
    r = run(["_fft2octave", "4"], x.tobytes())
    assert b"semilogy" in r.stdout and b"fftdata=[" in r.stdout


def test_help_and_search():
    r = run(["--help"])
    assert b"fastddc_inv_cc" in r.stderr
    r = run(["?shift"])
    assert b"shift_math_cc" in r.stdout


def test_checkdocs_every_command_in_readme():
    """The reference's `make checkdocs` (Makefile:107-111): every CLI
    command must appear in the README."""
    from csdr_tpu import cli
    readme = open(os.path.join(os.path.dirname(__file__), "..",
                               "README.md")).read()
    missing = [n for n in cli.REGISTRY if f"`{n}`" not in readme
               and not n.startswith("-")]
    assert not missing, f"commands missing from README: {missing}"


def test_dynamic_bufsize_protocol():
    """CSDR_DYNAMIC_BUFSIZE_ON: every stage reads/sends the 8-byte
    "csdr"+int32 preamble (reference csdr.c:325-392)."""
    import subprocess
    env = dict(os.environ, JAX_PLATFORMS="cpu", CSDR_DYNAMIC_BUFSIZE_ON="1")
    p1 = subprocess.Popen([sys.executable, "-m", "csdr_tpu.cli",
                           "yes_f", "2.0", "1024"],
                          stdout=subprocess.PIPE, env=env)
    p2 = subprocess.run([sys.executable, "-m", "csdr_tpu.cli",
                         "gain_ff", "3.0"],
                        stdin=p1.stdout, capture_output=True, env=env,
                        timeout=300)
    p1.wait()
    assert p2.stdout[:4] == b"csdr"
    n = int.from_bytes(p2.stdout[4:8], "little")
    assert n > 0
    y = np.frombuffer(p2.stdout[8:], np.float32)
    np.testing.assert_allclose(y, 6.0)


def test_waterfall_composite_chain():
    """The OpenWebRX waterfall transport chain as shell stages:
    fft_cc | logaveragepower_cf | fft_exchange_sides_ff |
    compress_fft_adpcm_f_u8 — composite CLI round-trip with a tone, decoded
    back through the ADPCM codec to check the spectral peak lands in the
    right (side-exchanged) bin."""
    import subprocess
    fft_n, every, avg = 256, 256, 4
    n = fft_n * avg * 4
    x = np.exp(2j * np.pi * 0.125 * np.arange(n)).astype(np.complex64)
    wire = np.stack([x.real, x.imag], -1).astype(np.float32).tobytes()
    env = dict(os.environ, JAX_PLATFORMS="cpu")

    def stage(cmd, data):
        r = subprocess.run([sys.executable, "-m", "csdr_tpu.cli"] + cmd,
                           input=data, capture_output=True, timeout=300,
                           env=env)
        assert r.returncode == 0, r.stderr.decode()[-400:]
        return r.stdout

    spec = stage(["fft_cc", str(fft_n), str(every)], wire)
    logavg = stage(["logaveragepower_cf", "0", str(fft_n), str(avg)], spec)
    swapped = stage(["fft_exchange_sides_ff", str(fft_n)], logavg)
    packed = stage(["compress_fft_adpcm_f_u8", str(fft_n)], swapped)
    assert len(packed) > 0
    # decode one compressed row back (codec pads COMPRESS_FFT_PAD_N=10)
    row = stage(["decode_ima_adpcm_u8_s16"], packed[: (fft_n + 10) // 2])
    vals = np.frombuffer(row, np.int16)[10:]
    assert len(vals) == fft_n
    # tone at +0.125 -> after fftshift it sits at bin n/2 + n/8
    peak = int(np.argmax(vals))
    assert abs(peak - (fft_n // 2 + fft_n // 8)) <= 1, peak


def test_fastddc_inv_live_fifo_retune():
    """fastddc_inv_cc --fifo: retune mid-stream (reference csdr.c:2308-2339)
    via the dynamic fold-matrix path — output must follow the new channel."""
    import subprocess
    import tempfile
    import threading
    import time as _time
    fifo = tempfile.mktemp()
    os.mkfifo(fifo)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    n = 16 * 896 * 8
    k = np.arange(n)
    x = (np.exp(2j * np.pi * 0.11 * k) +
         np.exp(-2j * np.pi * 0.27 * k)).astype(np.complex64)
    p1 = subprocess.run(
        [sys.executable, "-m", "csdr_tpu.cli", "fastddc_fwd_cc", "16"],
        input=np.stack([x.real, x.imag], -1).astype(np.float32).tobytes(),
        capture_output=True, timeout=300, env=env)
    spec = p1.stdout
    half = len(spec) // 2
    half -= half % (1024 * 8)
    p2 = subprocess.Popen(
        [sys.executable, "-m", "csdr_tpu.cli", "fastddc_inv_cc",
         "--fifo", fifo, "16"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, env=env)
    try:
        wfd = os.open(fifo, os.O_WRONLY)
        os.write(wfd, b"-0.11\n")
        chunks = []

        def reader():
            while True:
                d = p2.stdout.read1(1 << 16)   # read1: don't block for fill
                if not d:
                    break
                chunks.append(d)

        rt = threading.Thread(target=reader, daemon=True)
        rt.start()
        p2.stdin.write(spec[:half])
        p2.stdin.flush()
        deadline = _time.time() + 240
        while sum(map(len, chunks)) == 0:
            assert _time.time() < deadline, "no output from first half"
            _time.sleep(0.5)
        _time.sleep(2)
        n_first = sum(map(len, chunks))
        os.write(wfd, b"0.27\n")
        _time.sleep(1)
        p2.stdin.write(spec[half:])
        p2.stdin.close()
        p2.wait(timeout=300)
        rt.join(timeout=30)
        y = np.frombuffer(b"".join(chunks), np.float32)
        y = y[0::2] + 1j * y[1::2]
        m1 = n_first // 8

        def peak(seg):
            s = np.abs(np.fft.fft(seg * np.hanning(len(seg))))
            return np.fft.fftfreq(len(seg))[np.argmax(s)]

        assert len(y) - m1 > 2048, (len(y), m1)
        assert abs(peak(y[256:m1])) < 0.02          # tuned to +0.11 tone
        assert abs(peak(y[m1 + 1024:])) < 0.02      # retuned to -0.27 tone
        os.close(wfd)
    finally:
        p2.kill()
        os.unlink(fifo)


def test_csdr_fm_pipeline_over_pipes():
    """The canonical WFM app (reference csdr-fm:41) as REAL shell-style
    piped CLI processes: u8 IQ -> convert_u8_f | fmdemod_quadri_cf |
    fractional_decimator_ff 5 | deemphasis_wfm_ff | convert_f_s16, fed a
    synthetic FM carrier with a 1 kHz tone; the tone must dominate the
    decoded audio."""
    import subprocess
    fs = 240_000
    t = np.arange(fs) / fs
    audio_in = 0.5 * np.sin(2 * np.pi * 1000 * t)
    phase = 2 * np.pi * np.cumsum(audio_in) * 75_000 / fs
    iq = np.exp(1j * phase)
    u8 = np.empty((fs, 2), np.uint8)
    u8[:, 0] = np.clip(np.round(iq.real * 127 + 127), 0, 255)
    u8[:, 1] = np.clip(np.round(iq.imag * 127 + 127), 0, 255)
    env = dict(os.environ, JAX_PLATFORMS="cpu")

    cmds = [["convert_u8_f"], ["fmdemod_quadri_cf"],
            ["fractional_decimator_ff", "5"],
            ["deemphasis_wfm_ff", "48000", "50e-6"], ["convert_f_s16"]]
    procs = []
    prev = subprocess.PIPE
    for i, c in enumerate(cmds):
        p = subprocess.Popen(
            [sys.executable, "-m", "csdr_tpu.cli"] + c,
            stdin=(subprocess.PIPE if i == 0 else procs[-1].stdout),
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, env=env)
        procs.append(p)
    procs[0].stdin.write(u8.tobytes())
    procs[0].stdin.close()
    out = procs[-1].stdout.read()
    for p in procs:
        p.wait(timeout=120)
    audio = np.frombuffer(out, np.int16).astype(np.float32)
    assert len(audio) > 20_000, len(audio)
    seg = audio[2000:]
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    peak_hz = np.argmax(spec) * 48000 / len(seg)
    assert abs(peak_hz - 1000) < 10, peak_hz


def test_fixed_bufsize_env():
    """CSDR_FIXED_BUFSIZE controls the pump chunk (reference parse_env,
    csdr.c:394-417) — output must be identical regardless of chunking."""
    import subprocess
    x = (0.3 * np.random.default_rng(1).standard_normal(40000)).astype(np.float32)
    outs = []
    for bufsize in (None, "1000", "16384"):
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        if bufsize:
            env["CSDR_FIXED_BUFSIZE"] = bufsize
        r = subprocess.run([sys.executable, "-m", "csdr_tpu.cli",
                            "gain_ff", "3.0"],
                           input=x.tobytes(), capture_output=True,
                           timeout=300, env=env)
        assert r.returncode == 0
        outs.append(np.frombuffer(r.stdout, np.float32))
    for o in outs[1:]:
        np.testing.assert_array_equal(outs[0], o)
