"""Network runtime tests (SURVEY.md §2.11): the C++ tsmpool + nmux and the
ddcd-tpu server.  nmux/tsmpool are built from native/ via make; ddcd runs as
a subprocess fed a synthetic two-channel wideband stream."""

import ctypes
import os
import socket
import subprocess
import sys
import threading
import time
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parent.parent
NATIVE = ROOT / "native"


@pytest.fixture(scope="module")
def native_build():
    subprocess.run(["make", "-C", str(NATIVE)], check=True,
                   capture_output=True)
    return NATIVE / "build"


def test_tsmpool_fanout_and_lapping(native_build):
    lib = ctypes.CDLL(str(native_build / "libtsmpool.so"))
    lib.tsmpool_new.restype = ctypes.c_void_p
    lib.tsmpool_new.argtypes = [ctypes.c_size_t, ctypes.c_size_t]
    lib.tsmpool_write.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.tsmpool_register_reader.argtypes = [ctypes.c_void_p]
    lib.tsmpool_read.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                 ctypes.c_char_p, ctypes.c_int]
    lib.tsmpool_close.argtypes = [ctypes.c_void_p]
    lib.tsmpool_delete.argtypes = [ctypes.c_void_p]

    h = lib.tsmpool_new(4, 4)
    r1 = lib.tsmpool_register_reader(h)
    lib.tsmpool_write(h, b"AAAA")
    lib.tsmpool_write(h, b"BBBB")
    out = ctypes.create_string_buffer(4)
    assert lib.tsmpool_read(h, r1, out, 0) == 1 and out.raw == b"AAAA"
    assert lib.tsmpool_read(h, r1, out, 0) == 1 and out.raw == b"BBBB"
    assert lib.tsmpool_read(h, r1, out, 0) == 0        # caught up
    # a reader registered now sees only future buffers
    r2 = lib.tsmpool_register_reader(h)
    assert lib.tsmpool_read(h, r2, out, 0) == 0
    # lapping: write depth+2 buffers; r2 must skip to the oldest live one
    for i in range(6):
        lib.tsmpool_write(h, bytes([65 + i]) * 4)
    got = []
    while lib.tsmpool_read(h, r2, out, 0):
        got.append(out.raw)
    assert got == [b"DDDD", b"EEEE", b"FFFF"]          # depth-1 newest kept
    lib.tsmpool_close(h)
    assert lib.tsmpool_read(h, r2, out, 1) == 0        # wait returns on close
    lib.tsmpool_delete(h)


def _recv_n(sock, n, timeout=10.0):
    sock.settimeout(timeout)
    data = b""
    while len(data) < n:
        chunk = sock.recv(n - len(data))
        if not chunk:
            break
        data += chunk
    return data


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_nmux_two_clients(native_build):
    port = _free_port()
    payload = bytes(range(256)) * 1024          # 256 KiB = 64 buffers of 4 KiB
    proc = subprocess.Popen(
        [str(native_build / "nmux"), "--port", str(port),
         "--address", "127.0.0.1", "--bufsize", "4096", "--bufcnt", "128"],
        stdin=subprocess.PIPE, stderr=subprocess.PIPE)
    try:
        time.sleep(0.3)
        c1 = socket.create_connection(("127.0.0.1", port), timeout=5)
        c2 = socket.create_connection(("127.0.0.1", port), timeout=5)
        time.sleep(0.2)                          # let reader threads register
        proc.stdin.write(payload)
        proc.stdin.close()
        d1 = _recv_n(c1, len(payload))
        d2 = _recv_n(c2, len(payload))
        assert d1 == payload
        assert d2 == payload
        c1.close()
        c2.close()
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def test_nmux_partial_tail_published(native_build):
    """A finite stream whose length is NOT a multiple of bufsize must be
    delivered in full: the partial final buffer is published at EOF with its
    exact length (ADVICE r1: tail bytes were silently dropped)."""
    port = _free_port()
    payload = bytes(range(256)) * 17 + b"TAIL!"   # 4357 bytes, bufsize 1024
    proc = subprocess.Popen(
        [str(native_build / "nmux"), "--port", str(port),
         "--address", "127.0.0.1", "--bufsize", "1024", "--bufcnt", "16"],
        stdin=subprocess.PIPE, stderr=subprocess.PIPE)
    try:
        time.sleep(0.3)
        c1 = socket.create_connection(("127.0.0.1", port), timeout=5)
        time.sleep(0.2)
        proc.stdin.write(payload)
        proc.stdin.close()
        d1 = _recv_n(c1, len(payload))
        assert d1 == payload
        c1.close()
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def test_tsmpool_partial_len_abi(native_build):
    """tsmpool_write_len/tsmpool_read_len round-trip short buffers."""
    lib = ctypes.CDLL(str(native_build / "libtsmpool.so"))
    lib.tsmpool_new.restype = ctypes.c_void_p
    lib.tsmpool_new.argtypes = [ctypes.c_size_t, ctypes.c_size_t]
    lib.tsmpool_write_len.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                      ctypes.c_int]
    lib.tsmpool_register_reader.argtypes = [ctypes.c_void_p]
    lib.tsmpool_read_len.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                     ctypes.c_char_p, ctypes.c_int]
    lib.tsmpool_delete.argtypes = [ctypes.c_void_p]
    h = lib.tsmpool_new(8, 4)
    r = lib.tsmpool_register_reader(h)
    lib.tsmpool_write_len(h, b"12345678", 8)
    lib.tsmpool_write_len(h, b"xyz", 3)
    out = ctypes.create_string_buffer(8)
    assert lib.tsmpool_read_len(h, r, out, 0) == 8 and out.raw == b"12345678"
    assert lib.tsmpool_read_len(h, r, out, 0) == 3 and out.raw[:3] == b"xyz"
    assert lib.tsmpool_read_len(h, r, out, 0) == -1
    lib.tsmpool_delete(h)


def _tone_mix(fs_n, rates, amps, seed=0):
    """Wideband: sum of complex tones at given normalized rates."""
    n = np.arange(fs_n)
    x = np.zeros(fs_n, np.complex64)
    for r, a in zip(rates, amps):
        x += (a * np.exp(2j * np.pi * r * n)).astype(np.complex64)
    rng = np.random.default_rng(seed)
    x += 0.001 * (rng.standard_normal(fs_n) +
                  1j * rng.standard_normal(fs_n)).astype(np.complex64)
    return x


@pytest.mark.parametrize("method", ["fastddc", "td"])
def test_ddcd_two_clients(method):
    """Two clients on different channels each get their own tone back."""
    port = _free_port()
    rates = (0.11, -0.21)
    decim = 16
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "csdr_tpu.server.ddcd", "--port", str(port),
         "--decimation", str(decim), "--method", method, "--frames", "4",
         "--max_channels", "4"],
        stdin=subprocess.PIPE, stderr=subprocess.PIPE, env=env)
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                c1 = socket.create_connection(("127.0.0.1", port), timeout=2)
                break
            except OSError:
                time.sleep(0.2)
                if proc.poll() is not None:
                    raise AssertionError(proc.stderr.read().decode())
        c2 = socket.create_connection(("127.0.0.1", port), timeout=5)
        # `shift=r` mixes by +r (reference semantics), so to receive the
        # tone at +rate the client asks for shift=-rate
        c1.sendall(f"shift={-rates[0]}\n".encode())
        c2.sendall(f"shift={-rates[1]}\n".encode())
        time.sleep(0.3)

        # feed enough wideband for several chunks
        x = _tone_mix(1 << 19, rates, (1.0, 1.0))

        def feeder():
            try:
                proc.stdin.write(
                    np.stack([x.real, x.imag], -1).astype(np.float32).tobytes())
                proc.stdin.close()
            except OSError:
                pass

        threading.Thread(target=feeder, daemon=True).start()
        want = 4096 * 8          # complex samples per client to check
        d1 = _recv_n(c1, want * 8, timeout=120)
        d2 = _recv_n(c2, want * 8, timeout=120)
        for d, r in ((d1, rates[0]), (d2, rates[1])):
            y = np.frombuffer(d, np.float32)
            y = (y[0::2] + 1j * y[1::2])[512:]   # skip filter warmup
            assert len(y) > 4096, len(y)
            spec = np.abs(np.fft.fft(y * np.hanning(len(y))))
            peak = np.fft.fftfreq(len(y))[np.argmax(spec)]
            # the channel tone should land at baseband (|f| small)
            assert abs(peak) < 0.02, (r, peak)
            # and carry most of the energy
            assert spec.max() > 10 * np.median(spec)
        c1.close()
        c2.close()
    finally:
        proc.terminate()
        proc.wait(timeout=15)


@pytest.mark.parametrize("front", ["py", "native"])
def test_ddcd_live_retune(front, native_build):
    """Mid-stream `shift=` retune must move the channel (the traced-args
    fold-matrix update path — no recompile); 'native' routes the command
    through the C++ front's pipe protocol."""
    port = _free_port()
    decim = 16
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "csdr_tpu.server.ddcd", "--port", str(port),
         "--decimation", str(decim), "--method", "fastddc", "--frames", "4",
         "--max_channels", "2", "--front", front],
        stdin=subprocess.PIPE, stderr=subprocess.PIPE, env=env)
    try:
        deadline = time.time() + 60
        while True:
            try:
                c = socket.create_connection(("127.0.0.1", port), timeout=2)
                break
            except OSError:
                assert time.time() < deadline
                time.sleep(0.2)
                assert proc.poll() is None
        c.sendall(b"shift=-0.11\n")
        time.sleep(0.3)
        x = _tone_mix(1 << 18, (0.11, -0.27), (1.0, 1.0))
        wire = np.stack([x.real, x.imag], -1).astype(np.float32).tobytes()
        half = len(wire) // 2

        def feed(data):
            proc.stdin.write(data)
            proc.stdin.flush()

        threading.Thread(target=feed, args=(wire[:half],), daemon=True).start()
        d1 = _recv_n(c, 4096 * 8, timeout=120)
        y1 = np.frombuffer(d1, np.float32)
        y1 = (y1[0::2] + 1j * y1[1::2])[512:]
        s1 = np.abs(np.fft.fft(y1 * np.hanning(len(y1))))
        p1 = np.fft.fftfreq(len(y1))[np.argmax(s1)]
        assert abs(p1) < 0.02, p1            # tuned to the +0.11 tone

        # retune to the other tone mid-stream
        c.sendall(b"shift=0.27\n")
        time.sleep(0.5)

        def feed2():
            try:
                proc.stdin.write(wire[half:])
                proc.stdin.close()
            except OSError:
                pass

        threading.Thread(target=feed2, daemon=True).start()
        # skip the transition chunk, then expect the -0.27 tone at baseband
        _ = _recv_n(c, 4096 * 8, timeout=120)
        d2 = _recv_n(c, 4096 * 8, timeout=120)
        y2 = np.frombuffer(d2, np.float32)
        y2 = (y2[0::2] + 1j * y2[1::2])[512:]
        s2 = np.abs(np.fft.fft(y2 * np.hanning(len(y2))))
        p2 = np.fft.fftfreq(len(y2))[np.argmax(s2)]
        assert abs(p2) < 0.02, p2
        c.close()
    finally:
        proc.terminate()
        proc.wait(timeout=15)


def test_ddcd_bypass():
    """`bypass=1` switches the client to the raw wideband stream."""
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "csdr_tpu.server.ddcd", "--port", str(port),
         "--decimation", "16", "--method", "fastddc", "--frames", "4",
         "--max_channels", "2"],
        stdin=subprocess.PIPE, stderr=subprocess.PIPE, env=env)
    try:
        deadline = time.time() + 60
        while True:
            try:
                c = socket.create_connection(("127.0.0.1", port), timeout=2)
                break
            except OSError:
                assert time.time() < deadline
                time.sleep(0.2)
                assert proc.poll() is None
        c.sendall(b"bypass=1\n")
        time.sleep(0.3)
        x = _tone_mix(16 * 896 * 8, (0.11,), (1.0,))
        wire = np.stack([x.real, x.imag], -1).astype(np.float32).tobytes()

        def feed():
            try:
                proc.stdin.write(wire)
                proc.stdin.close()
            except OSError:
                pass

        threading.Thread(target=feed, daemon=True).start()
        chunk = 16 * 896 * 4 * 8      # one server chunk of raw bytes
        d = _recv_n(c, chunk, timeout=120)
        assert d == wire[:chunk]      # raw wideband passthrough, bit-exact
        c.close()
    finally:
        proc.terminate()
        proc.wait(timeout=15)


def test_ddcd_classed_decimation():
    """D=50 exercises the phase-classed dynamic inverse in the server."""
    port = _free_port()
    rate = 0.11
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "csdr_tpu.server.ddcd", "--port", str(port),
         "--decimation", "50", "--method", "fastddc", "--frames", "25",
         "--max_channels", "2"],
        stdin=subprocess.PIPE, stderr=subprocess.PIPE, env=env)
    try:
        deadline = time.time() + 90
        while True:
            try:
                c = socket.create_connection(("127.0.0.1", port), timeout=2)
                break
            except OSError:
                assert time.time() < deadline
                time.sleep(0.2)
                assert proc.poll() is None
        c.sendall(f"shift={-rate}\n".encode())
        time.sleep(0.3)
        x = _tone_mix(896 * 25 * 12, (rate,), (1.0,))

        def feeder():
            try:
                proc.stdin.write(
                    np.stack([x.real, x.imag], -1).astype(np.float32).tobytes())
                proc.stdin.close()
            except OSError:
                pass

        threading.Thread(target=feeder, daemon=True).start()
        d = _recv_n(c, 2048 * 8, timeout=180)
        y = np.frombuffer(d, np.float32)
        y = (y[0::2] + 1j * y[1::2])[256:]
        assert len(y) > 1024
        spec = np.abs(np.fft.fft(y * np.hanning(len(y))))
        peak = np.fft.fftfreq(len(y))[np.argmax(spec)]
        assert abs(peak) < 0.02, peak
        c.close()
    finally:
        proc.terminate()
        proc.wait(timeout=15)


def test_nmux_slow_client_lapped_not_stalling(native_build):
    """The drop-oldest property: a stalled client must NOT stall the
    producer or a fast client; when it resumes it has lost data (lapped)
    rather than buffered everything."""
    port = _free_port()
    # pool gives the FAST client 4 MiB of slack (never lapped at loopback
    # speed); the payload exceeds pool + the stalled client's socket
    # buffering (tcp_wmem max ~4 MiB) so its blocked nmux thread laps
    bufsize, bufcnt = 4096, 1024
    payload = bytes(range(256)) * 32768  # 8 MiB
    proc = subprocess.Popen(
        [str(native_build / "nmux"), "--port", str(port),
         "--address", "127.0.0.1", "--bufsize", str(bufsize),
         "--bufcnt", str(bufcnt)],
        stdin=subprocess.PIPE, stderr=subprocess.PIPE)
    try:
        time.sleep(0.3)
        fast = socket.create_connection(("127.0.0.1", port), timeout=5)
        slow = socket.create_connection(("127.0.0.1", port), timeout=5)
        slow.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 4096)
        time.sleep(0.2)

        got_fast = []

        def fast_reader():
            while True:
                d = fast.recv(1 << 16)
                if not d:
                    break
                got_fast.append(d)

        t = threading.Thread(target=fast_reader, daemon=True)
        t.start()
        # throttled producer: the fast client keeps up; the slow client
        # (stalled, tiny RCVBUF) falls a full pool depth behind and laps
        for i in range(0, len(payload), 65536):
            proc.stdin.write(payload[i:i + 65536])
            proc.stdin.flush()
            time.sleep(0.001)
        proc.stdin.close()
        t.join(timeout=30)
        fast_bytes = b"".join(got_fast)
        assert fast_bytes == payload       # fast client: complete stream
        # the slow client must have lost data: drain for a bounded time
        # (its 4 KiB RCVBUF crawls, and exact drop-oldest semantics are
        # unit-tested on tsmpool) and check it cannot produce the payload
        slow.settimeout(1)
        got_slow = b""
        deadline = time.time() + 8
        try:
            while time.time() < deadline:
                d = slow.recv(1 << 16)
                if not d:
                    break
                got_slow += d
        except socket.timeout:
            pass
        assert len(got_slow) < len(payload), len(got_slow)
        fast.close()
        slow.close()
    finally:
        proc.terminate()
        proc.wait(timeout=10)


@pytest.mark.parametrize("front", ["py", "native"])
def test_nmux_feeding_ddcd_over_tcp(native_build, front):
    """Composition: nmux fan-out --tcp--> ddcd --input tcp://, client
    receives its channel — the reference's multi-process topology
    (rtl_sdr | nmux; nc | ddcd) over real sockets; 'native' adds the C++
    client front (three processes: nmux -> ddcd device loop -> ddcd_front)."""
    nmux_port, ddcd_port = _free_port(), _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    nmux = subprocess.Popen(
        [str(native_build / "nmux"), "--port", str(nmux_port),
         "--address", "127.0.0.1", "--bufsize", "16384", "--bufcnt", "256"],
        stdin=subprocess.PIPE, stderr=subprocess.DEVNULL)
    ddcd = subprocess.Popen(
        [sys.executable, "-m", "csdr_tpu.server.ddcd", "--port",
         str(ddcd_port), "--decimation", "16", "--frames", "4",
         "--max_channels", "2", "--front", front,
         "--input", f"tcp://127.0.0.1:{nmux_port}"],
        stderr=subprocess.DEVNULL, env=env)
    try:
        deadline = time.time() + 90
        while True:
            try:
                c = socket.create_connection(("127.0.0.1", ddcd_port),
                                             timeout=2)
                break
            except OSError:
                assert time.time() < deadline
                assert ddcd.poll() is None
                time.sleep(0.3)
        c.sendall(b"shift=-0.11\n")
        time.sleep(0.3)
        x = _tone_mix(1 << 18, (0.11,), (1.0,))
        nmux.stdin.write(
            np.stack([x.real, x.imag], -1).astype(np.float32).tobytes())
        nmux.stdin.flush()
        d = _recv_n(c, 4096 * 8, timeout=120)
        y = np.frombuffer(d, np.float32)
        y = (y[0::2] + 1j * y[1::2])[512:]
        spec = np.abs(np.fft.fft(y * np.hanning(len(y))))
        peak = np.fft.fftfreq(len(y))[np.argmax(spec)]
        assert abs(peak) < 0.02, peak
        c.close()
    finally:
        ddcd.terminate()
        nmux.terminate()
        ddcd.wait(timeout=15)
        nmux.wait(timeout=15)


def test_ddcd_native_front(native_build):
    """The C++ client front (native/ddcd_front.cpp): the Python device loop
    serves through the spawned front process — connect, retune mid-stream,
    bypass, and slot release all ride the parent pipe protocol."""
    port = _free_port()
    decim = 16
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "csdr_tpu.server.ddcd", "--port", str(port),
         "--decimation", str(decim), "--frames", "4", "--max_channels", "4",
         "--front", "native"],
        stdin=subprocess.PIPE, stderr=subprocess.PIPE, env=env)
    try:
        deadline = time.time() + 90
        while True:
            try:
                c1 = socket.create_connection(("127.0.0.1", port), timeout=2)
                break
            except OSError:
                assert time.time() < deadline
                if proc.poll() is not None:
                    raise AssertionError(proc.stderr.read().decode())
                time.sleep(0.2)
        c2 = socket.create_connection(("127.0.0.1", port), timeout=5)
        c1.sendall(b"shift=-0.11\n")
        c2.sendall(b"bypass=1\n")
        time.sleep(0.5)

        x = _tone_mix(1 << 19, (0.11,), (1.0,))
        raw = np.stack([x.real, x.imag], -1).astype(np.float32).tobytes()
        stop = threading.Event()

        def feeder():
            # keep the wideband stream alive until the test's checks are
            # done: stdin EOF is the server's NORMAL shutdown, and the
            # slot-reuse check below must not race the drain
            try:
                while not stop.is_set():
                    proc.stdin.write(raw)
                proc.stdin.close()
            except OSError:
                pass

        threading.Thread(target=feeder, daemon=True).start()
        # c1: decimated channel with the tone at baseband
        d1 = _recv_n(c1, 4096 * 8, timeout=120)
        y = np.frombuffer(d1, np.float32)
        y = (y[0::2] + 1j * y[1::2])[512:]
        spec = np.abs(np.fft.fft(y * np.hanning(len(y))))
        peak = np.fft.fftfreq(len(y))[np.argmax(spec)]
        assert abs(peak) < 0.02, peak
        assert spec.max() > 10 * np.median(spec)
        # c2: bypass = raw wideband bytes, verbatim prefix
        d2 = _recv_n(c2, 1 << 16, timeout=120)
        assert d2 == raw[:len(d2)] and len(d2) == 1 << 16
        # release c1's slot; a new client must be accepted into it
        c1.close()
        time.sleep(0.5)
        c3 = socket.create_connection(("127.0.0.1", port), timeout=5)
        c3.close()
        c2.close()
        stop.set()
    finally:
        proc.terminate()
        proc.wait(timeout=15)


def test_ddcd_native_front_client_churn(native_build):
    """Rapid connect/disconnect cycles against the native front while the
    wideband stream flows: the device loop must never crash, and a client
    arriving after the churn still gets its channel."""
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "csdr_tpu.server.ddcd", "--port", str(port),
         "--decimation", "16", "--frames", "4", "--max_channels", "4",
         "--front", "native"],
        stdin=subprocess.PIPE, stderr=subprocess.PIPE, env=env)
    try:
        deadline = time.time() + 90
        while True:
            try:
                socket.create_connection(("127.0.0.1", port),
                                         timeout=2).close()
                break
            except OSError:
                assert time.time() < deadline
                if proc.poll() is not None:
                    raise AssertionError(proc.stderr.read().decode())
                time.sleep(0.2)

        x = _tone_mix(1 << 19, (0.11,), (1.0,))
        raw = np.stack([x.real, x.imag], -1).astype(np.float32).tobytes()
        stop = threading.Event()

        def feeder():
            # loop the stream so churn happens under continuous load
            try:
                while not stop.is_set():
                    proc.stdin.write(raw)
                proc.stdin.close()
            except OSError:
                pass

        threading.Thread(target=feeder, daemon=True).start()
        for i in range(20):
            try:
                c = socket.create_connection(("127.0.0.1", port), timeout=5)
                c.sendall(f"shift={0.01 * (i % 7)}\n".encode())
                if i % 3 == 0:
                    c.recv(4096)        # some clients read a little
                c.close()               # some vanish immediately
            except OSError:
                pass
        assert proc.poll() is None, proc.stderr.read().decode()
        # a fresh client after the churn still gets a working channel
        c = socket.create_connection(("127.0.0.1", port), timeout=5)
        c.sendall(b"shift=-0.11\n")
        # samples produced BEFORE the retune command is processed stream at
        # the slot's previous shift (same semantics as the reference ddcd);
        # under scheduler load that can be several chunks, so poll windows
        # until the retuned peak appears
        deadline = time.time() + 120
        while True:
            d = _recv_n(c, 4096 * 8, timeout=120)
            y = np.frombuffer(d, np.float32)
            y = (y[0::2] + 1j * y[1::2])[512:]
            spec = np.abs(np.fft.fft(y * np.hanning(len(y))))
            peak = np.fft.fftfreq(len(y))[np.argmax(spec)]
            if abs(peak) < 0.02:
                break
            assert time.time() < deadline, f"retuned peak never appeared: {peak}"
        c.close()
        stop.set()
    finally:
        proc.terminate()
        proc.wait(timeout=15)


def test_ddcd_server_small_decimation_inprocess():
    """DdcdServer at D=4: the dynamic channelizer's retune payload is
    mpad_for-sized (m=224 > 128); claim, retune, run a chunk, release —
    no sockets, straight through the device-step plumbing."""
    from csdr_tpu.ops import fastddc as fd
    from csdr_tpu.server.ddcd import DdcdServer

    srv = DdcdServer(4, 0.05, max_channels=2, method="fastddc", frames=8)
    assert srv.factored
    assert srv.d_np.shape[1] == fd.mpad_for(srv.ddc) == 256
    srv.set_shift(0, -0.11)
    n = srv.chunk_in
    t = np.arange(n)
    x = np.exp(2j * np.pi * 0.11 * t).astype(np.complex64)
    dr, di, counts = srv._run_chunk(x)
    k = int(counts[0])
    assert k > 256
    y = (dr[0, :k] + 1j * di[0, :k])[64:]
    spec = np.abs(np.fft.fft(y * np.hanning(len(y))))
    peak = np.fft.fftfreq(len(y))[np.argmax(spec)]
    assert abs(peak) < 0.02, peak
