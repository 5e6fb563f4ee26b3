"""sdr.js analog (SURVEY L4 row): WebSocket bridge + browser library.

Protocol-level tests (no browser/node in this image): a minimal RFC 6455
client drives examples/ws_bridge.py end-to-end — remote-kernel /pipe
round-trip and /nmux proxying — and the pure-JS IMA ADPCM codec shipped
in examples/sdr.js is validated by checking its tables and transcribing
its nibble algorithm against ops/adpcm's golden-tested decoder."""

import base64
import hashlib
import os
import re
import socket
import struct
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
ENV = dict(os.environ, JAX_PLATFORMS="cpu", CSDR_TPU_TEST_PLATFORM="cpu")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


class _WsConn:
    """Client socket + leftover buffer: the server's first frames can
    coalesce into the same TCP segment as the 101 handshake response."""

    def __init__(self, sock, leftover):
        self.sock = sock
        self.buf = leftover

    def recv(self, n):
        if self.buf:
            out, self.buf = self.buf[:n], self.buf[n:]
            return out
        return self.sock.recv(n)

    def sendall(self, b):
        self.sock.sendall(b)

    def shutdown(self, how):
        self.sock.shutdown(how)

    def close(self):
        self.sock.close()

    def settimeout(self, t):
        self.sock.settimeout(t)


def _ws_connect(port, path):
    conn = socket.create_connection(("127.0.0.1", port), timeout=20)
    key = base64.b64encode(os.urandom(16)).decode()
    conn.sendall((f"GET {path} HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
                  f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n"
                  "Sec-WebSocket-Version: 13\r\n\r\n").encode())
    head = b""
    while b"\r\n\r\n" not in head:
        head += conn.recv(4096)
    head, _, leftover = head.partition(b"\r\n\r\n")
    assert b"101" in head.split(b"\r\n", 1)[0], head
    want = base64.b64encode(hashlib.sha1(
        (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").encode()
    ).digest())
    assert want in head
    return _WsConn(conn, leftover)


def _ws_send(conn, payload, opcode=0x2):
    mask = os.urandom(4)
    n = len(payload)
    if n < 126:
        hdr = struct.pack("!BB", 0x80 | opcode, 0x80 | n)
    elif n < (1 << 16):
        hdr = struct.pack("!BBH", 0x80 | opcode, 0x80 | 126, n)
    else:
        hdr = struct.pack("!BBQ", 0x80 | opcode, 0x80 | 127, n)
    masked = bytes(c ^ mask[i % 4] for i, c in enumerate(payload))
    conn.sendall(hdr + mask + masked)


def _recv_exact(conn, n):
    out = b""
    while len(out) < n:
        chunk = conn.recv(n - len(out))
        if not chunk:
            return None
        out += chunk
    return out


def _ws_recv(conn):
    hdr = _recv_exact(conn, 2)
    if hdr is None:
        return None
    b0, b1 = hdr
    n = b1 & 0x7F
    if n == 126:
        n = struct.unpack("!H", _recv_exact(conn, 2))[0]
    elif n == 127:
        n = struct.unpack("!Q", _recv_exact(conn, 8))[0]
    payload = _recv_exact(conn, n) if n else b""
    if (b0 & 0x0F) == 0x8:
        return None
    return payload


def _start_bridge(port):
    proc = subprocess.Popen(
        [sys.executable, "examples/ws_bridge.py", "--port", str(port)],
        cwd=ROOT, env=ENV, stderr=subprocess.PIPE)
    deadline = time.time() + 10
    while time.time() < deadline:
        try:
            socket.create_connection(("127.0.0.1", port), timeout=1).close()
            return proc
        except OSError:
            time.sleep(0.1)
    proc.terminate()
    raise RuntimeError("bridge did not start")


def test_pipe_remote_kernel_roundtrip():
    """Browser-style client runs convert_u8_f on the server and gets f32
    frames back — the sdr.js 'call a kernel' surface, server-computed."""
    port = _free_port()
    proc = _start_bridge(port)
    try:
        conn = _ws_connect(port, "/pipe/convert_u8_f")
        raw = np.arange(256, dtype=np.uint8)
        _ws_send(conn, raw.tobytes())
        conn.shutdown(socket.SHUT_WR)
        data = b""
        while True:
            fr = _ws_recv(conn)
            if fr is None:
                break
            data += fr
            if len(data) >= 256 * 4:
                break
        got = np.frombuffer(data[:256 * 4], np.float32)
        expect = raw.astype(np.float32) / 127.5 - 1.0
        np.testing.assert_allclose(got, expect, atol=1e-6)
        conn.close()
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def test_pipe_rejects_unsafe():
    port = _free_port()
    proc = _start_bridge(port)
    try:
        conn = _ws_connect(port, "/pipe/definitely_not_a_command")
        fr = _ws_recv(conn)
        assert fr == b"unknown command"
        conn.close()
        conn = _ws_connect(port, "/pipe/gain_ff?args=2.0;rm")
        fr = _ws_recv(conn)
        assert fr == b"bad argument"
        conn.close()
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def test_nmux_proxy():
    """Waterfall-style read-only stream through /nmux/<host>/<port>."""
    subprocess.run(["make", "-C", str(ROOT / "native")], check=True,
                   capture_output=True)
    nmux_port = _free_port()
    ws_port = _free_port()
    payload = bytes(range(256)) * 64
    nmux = subprocess.Popen(
        [str(ROOT / "native/build/nmux"), "--port", str(nmux_port),
         "--address", "127.0.0.1", "--bufsize", "4096", "--bufcnt", "16"],
        stdin=subprocess.PIPE, stderr=subprocess.PIPE)
    bridge = _start_bridge(ws_port)
    try:
        time.sleep(0.3)
        conn = _ws_connect(ws_port, f"/nmux/127.0.0.1/{nmux_port}")
        time.sleep(0.3)                    # reader registers at the head
        nmux.stdin.write(payload)
        nmux.stdin.close()
        data = b""
        while len(data) < len(payload):
            fr = _ws_recv(conn)
            if fr is None:
                break
            data += fr
        assert data == payload
        conn.close()
    finally:
        bridge.terminate()
        nmux.terminate()
        bridge.wait(timeout=10)
        nmux.wait(timeout=10)


def test_sdrjs_ima_adpcm_matches_library():
    """The pure-JS IMA ADPCM codec in examples/sdr.js: its tables must
    equal ops/adpcm's (bit-exact golden vs the reference C), and a Python
    transcription of its nibble algorithm must reproduce the library
    decoder exactly."""
    src = (ROOT / "examples/sdr.js").read_text()
    m = re.search(r"_IMA_STEPS = \[(.*?)\]", src, re.S)
    js_steps = [int(v) for v in m.group(1).replace("\n", " ").split(",")]
    m = re.search(r"_IMA_INDEX = \[(.*?)\]", src, re.S)
    js_index = [int(v) for v in m.group(1).split(",")]
    from csdr_tpu.ops import adpcm
    np.testing.assert_array_equal(js_steps, np.asarray(adpcm.STEP_SIZES))
    np.testing.assert_array_equal(js_index, np.asarray(adpcm.INDEX_ADJUST))

    def js_decode(u8):
        pred, index = 0, 0
        out = []
        for byte in u8:
            for nib in (byte & 0x0F, (byte >> 4) & 0x0F):
                step = js_steps[index]
                diff = step >> 3
                if nib & 1:
                    diff += step >> 2
                if nib & 2:
                    diff += step >> 1
                if nib & 4:
                    diff += step
                if nib & 8:
                    diff = -diff
                pred = max(-32768, min(32767, pred + diff))
                index = max(0, min(88, index + js_index[nib]))
                out.append(pred)
        return np.asarray(out, np.int16)

    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 512).astype(np.uint8)
    blk = adpcm.decode_block()
    st = blk.init()
    st, y = blk.apply(st, data)
    np.testing.assert_array_equal(js_decode(data), np.asarray(y))
