#!/usr/bin/env python3
"""Minimal ddcd-tpu client: connect, tune a channel, stream I/Q to stdout.

    python examples/ddcd_client.py --port 4953 --shift -0.11 | \
        python -m csdr_tpu.cli fmdemod_quadri_cf | ...

The server protocol is the reference ddcd's text commands over the data
socket (ddcd_old.cpp:497-526): `shift=<rate>` retunes live, `bypass=1`
switches to the raw wideband stream.
"""
import argparse
import socket
import sys

ap = argparse.ArgumentParser()
ap.add_argument("--host", default="127.0.0.1")
ap.add_argument("--port", type=int, default=4953)
ap.add_argument("--shift", type=float, required=True,
                help="mix rate (a channel centered at -shift comes to baseband)")
args = ap.parse_args()

s = socket.create_connection((args.host, args.port))
s.sendall(f"shift={args.shift}\n".encode())
while True:
    data = s.recv(1 << 16)
    if not data:
        break
    sys.stdout.buffer.write(data)
    sys.stdout.buffer.flush()
