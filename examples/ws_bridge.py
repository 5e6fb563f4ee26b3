"""WebSocket bridge: browser <-> csdr_tpu pipelines / nmux streams.

The reference ships sdr.js, an Emscripten build of libcsdr so browsers can
run DSP kernels in-page (reference Makefile:100-102, sdr.js/sdrjs-footer.js).
A TPU framework cannot run in a browser, so the equivalent here is
client-renders / server-computes: this bridge speaks RFC 6455 WebSocket on
one side (examples/sdr.js is the browser library) and on the other side
either

  * /pipe/<command>?args=a,b,c    — spawns `python -m csdr_tpu.cli
    <command> a b c` and streams binary samples both ways (the browser
    "calls a kernel" exactly like sdr.js callers did, with the DSP on the
    TPU server); commands are validated against cli.REGISTRY and args
    against a safe charset — no shell; or
  * /nmux/<host>/<port>           — proxies a raw nmux/ddcd TCP stream
    (read-only fan-out for waterfall clients).

Pure stdlib (the image has no websockets package): minimal RFC 6455
server — handshake, binary frames, close; client frames are unmasked per
the spec.  Run: `python examples/ws_bridge.py --port 8765`.
"""

from __future__ import annotations

import argparse
import base64
import hashlib
import os
import re
import socket
import struct
import subprocess
import sys
import threading

# the repo root (script lives in examples/), for `from csdr_tpu import cli`
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"
SAFE_ARG = re.compile(r"^[A-Za-z0-9_.,+\-]*$")


def _handshake(conn) -> str | None:
    """Read the HTTP upgrade request; reply 101.  Returns the path."""
    data = b""
    while b"\r\n\r\n" not in data:
        chunk = conn.recv(4096)
        if not chunk:
            return None
        data += chunk
    head = data.decode("latin1")
    m = re.match(r"GET\s+(\S+)\s+HTTP", head)
    k = re.search(r"Sec-WebSocket-Key:\s*(\S+)", head, re.I)
    if not m or not k:
        conn.sendall(b"HTTP/1.1 400 Bad Request\r\n\r\n")
        return None
    accept = base64.b64encode(
        hashlib.sha1((k.group(1) + WS_GUID).encode()).digest()).decode()
    conn.sendall(
        ("HTTP/1.1 101 Switching Protocols\r\n"
         "Upgrade: websocket\r\nConnection: Upgrade\r\n"
         f"Sec-WebSocket-Accept: {accept}\r\n\r\n").encode())
    return m.group(1)


def _send_frame(conn, payload: bytes, opcode: int = 0x2):
    n = len(payload)
    if n < 126:
        hdr = struct.pack("!BB", 0x80 | opcode, n)
    elif n < (1 << 16):
        hdr = struct.pack("!BBH", 0x80 | opcode, 126, n)
    else:
        hdr = struct.pack("!BBQ", 0x80 | opcode, 127, n)
    conn.sendall(hdr + payload)


def _recv_exact(conn, n: int) -> bytes | None:
    out = b""
    while len(out) < n:
        chunk = conn.recv(n - len(out))
        if not chunk:
            return None
        out += chunk
    return out


def _recv_frame(conn):
    """Returns (opcode, payload) or None on EOF/close."""
    hdr = _recv_exact(conn, 2)
    if hdr is None:
        return None
    b0, b1 = hdr
    opcode = b0 & 0x0F
    masked = b1 & 0x80
    n = b1 & 0x7F
    if n == 126:
        n = struct.unpack("!H", _recv_exact(conn, 2))[0]
    elif n == 127:
        n = struct.unpack("!Q", _recv_exact(conn, 8))[0]
    mask = _recv_exact(conn, 4) if masked else b"\x00" * 4
    payload = _recv_exact(conn, n) if n else b""
    if payload is None:
        return None
    if masked:
        payload = bytes(c ^ mask[i % 4] for i, c in enumerate(payload))
    if opcode == 0x8:                      # close
        return None
    return opcode, payload


def _serve_pipe(conn, command: str, args: list[str]):
    from csdr_tpu import cli
    if command not in cli.REGISTRY or command.startswith("-"):
        _send_frame(conn, b"unknown command", 0x1)
        return
    for a in args:
        if not SAFE_ARG.match(a):
            _send_frame(conn, b"bad argument", 0x1)
            return
    env = dict(os.environ)
    proc = subprocess.Popen(
        [sys.executable, "-m", "csdr_tpu.cli", command, *args],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, env=env)
    stop = threading.Event()

    def pump_out():
        while not stop.is_set():
            chunk = proc.stdout.read(65536)
            if not chunk:
                break
            try:
                _send_frame(conn, chunk)
            except OSError:
                break
        try:
            conn.shutdown(socket.SHUT_WR)
        except OSError:
            pass

    t = threading.Thread(target=pump_out, daemon=True)
    t.start()
    try:
        while True:
            fr = _recv_frame(conn)
            if fr is None:
                break
            _, payload = fr
            if payload:
                proc.stdin.write(payload)
                proc.stdin.flush()
    finally:
        try:
            proc.stdin.close()
        except OSError:
            pass
        t.join(timeout=10)
        stop.set()
        proc.terminate()


def _serve_nmux(conn, host: str, port: int):
    up = socket.create_connection((host, port), timeout=10)
    try:
        while True:
            chunk = up.recv(65536)
            if not chunk:
                break
            _send_frame(conn, chunk)
    finally:
        up.close()


def _client(conn):
    try:
        path = _handshake(conn)
        if not path:
            return
        if path.startswith("/pipe/"):
            rest = path[len("/pipe/"):]
            if "?" in rest:
                cmd, q = rest.split("?", 1)
                m = re.match(r"args=([^&]*)", q)
                args = m.group(1).split(",") if m and m.group(1) else []
            else:
                cmd, args = rest, []
            _serve_pipe(conn, cmd, args)
        elif path.startswith("/nmux/"):
            _, _, host, port = path.split("/", 3)
            _serve_nmux(conn, host, int(port))
        else:
            _send_frame(conn, b"unknown path", 0x1)
    finally:
        # graceful shutdown: close frame, half-close, drain — an abrupt
        # close() can RST the connection and discard the last sent frame
        try:
            _send_frame(conn, b"", 0x8)
            conn.shutdown(socket.SHUT_WR)
            conn.settimeout(2.0)
            while conn.recv(4096):
                pass
        except OSError:
            pass
        try:
            conn.close()
        except OSError:
            pass


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8765)
    ap.add_argument("--address", default="127.0.0.1")
    args = ap.parse_args(argv)
    srv = socket.socket()
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((args.address, args.port))
    srv.listen(16)
    sys.stderr.write(f"ws_bridge: ws://{args.address}:{args.port}/pipe/"
                     "<cmd>?args=a,b  or  /nmux/<host>/<port>\n")
    while True:
        conn, _ = srv.accept()
        threading.Thread(target=_client, args=(conn,), daemon=True).start()


if __name__ == "__main__":
    main()
