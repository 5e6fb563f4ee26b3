"""ddcd-tpu: a DDC (digital down-converter) server with per-TCP-client
channels, the TPU-native re-design of the reference's ddcd
(ddcd_old.cpp:97-560).

Where the reference forks a fresh `csdr` pipeline per client (time-domain
method) or a per-client `fastddc_inv_cc` process fed by one shared
`fastddc_fwd_cc` (ddcd_old.h:51-61), this server keeps ALL clients' channels
as rows of ONE batched device computation:

- **fastddc method**: one shared forward FFT of the wideband stream; the
  batched frequency-domain inverse (ops/fastddc.fastddc_inv_dynamic_block)
  channelizes every client at once.  Per-channel taps/fold-permutations/
  NCO rates are *traced arguments*, so claiming, releasing, or retuning a
  channel ("shift=<rate>\\n" on the client socket, same text protocol as
  ddcd_old.cpp:497-526) recomputes a few small host arrays and never
  recompiles.
- **td method**: vmapped NCO shift + shared-taps polyphase FIR decimation
  over the channel axis (the reference's shift_addfast_cc | fir_decimate_cc
  per-client pipeline, ddcd_old.h:51-57, collapsed into one batch).

Commands: `shift=<rate>` retune; `bypass=1`/`bypass=0` switch the client
between the raw wideband stream and its channel (ddcd_old.cpp:504-520).
Slow clients drop oldest buffers instead of stalling the device loop —
tsmpool semantics (native/tsmpool.hpp).

Usage:
    ... wideband f32-interleaved I/Q on stdin ...
    python -m csdr_tpu.server.ddcd --port 4953 --decimation 50 \\
        [--method fastddc|td] [--bw 0.05] [--max_channels 8] [--frames 16]
"""

from __future__ import annotations

import argparse
import socket
import sys
import threading
from collections import deque

import numpy as np


class _Client:
    def __init__(self, sock: socket.socket, slot: int):
        self.sock = sock
        self.slot = slot
        self.bypass = False
        self.queue: deque[bytes] = deque(maxlen=64)   # drop-oldest
        self.cond = threading.Condition()
        self.alive = True

    def push(self, data: bytes):
        with self.cond:
            self.queue.append(data)
            self.cond.notify()

    def stop(self):
        with self.cond:
            self.alive = False
            self.cond.notify()


class DdcdServer:
    def __init__(self, decimation: int, transition_bw: float = 0.05,
                 max_channels: int = 8, method: str = "fastddc",
                 frames: int = 16, port: int = 4953,
                 address: str = "127.0.0.1"):
        import jax
        import jax.numpy as jnp
        from csdr_tpu.ops import fastddc
        from csdr_tpu.core.cplx import CF

        self.jnp, self.CF = jnp, CF
        self.method = method
        self.decimation = decimation
        self.max_channels = c = max_channels
        self.port, self.address = port, address
        self.clients: dict[int, _Client] = {}
        self.lock = threading.Lock()          # slots + host channel arrays
        self.dirty = True
        self.running = True

        self.factored = False
        if method == "fastddc":
            self.ddc = fastddc.fastddc_init(transition_bw, decimation)
            pis, post = self.ddc.post_input_size, self.ddc.post_decimation
            self.factored = pis % post == 0
            if not self.factored:
                # classed path needs q-aligned chunks
                q = post // int(np.gcd(pis, post))
                frames = max(q, (frames // q) * q)
            self.chunk_in = self.ddc.input_size * frames
            fwd = fastddc.fastddc_fwd_block(self.ddc,
                                            spectra_order="kernel")
            if self.factored:
                # fused dynamic channelizer: split-DFT matmul replaces the
                # fwd FFT, per-channel TQ2/d rows ride as traced args
                # (retune payload fft+M complex values, ~50x smaller than
                # the dense column block); on TPU the step runs the VMEM
                # pallas kernel
                init_chan, step_chan = \
                    fastddc.fastddc_dynamic_channelizer_block(self.ddc, c)
                pre, inv = self.ddc.pre_decimation, self.ddc.fft_inv_size
                self.tq_np = np.zeros((c, pre, inv), np.complex64)
                self.d_np = np.zeros((c, fastddc.mpad_for(self.ddc)),
                                     np.complex64)
                self.rate_np = np.zeros((c,), np.float32)
                self.state = init_chan()

                def step(state, x, tq_re, tq_im, d_re, d_im, rates):
                    state, out = step_chan(state, x, CF(tq_re, tq_im),
                                           CF(d_re, d_im), rates)
                    return state, out.data, out.count
            else:
                init_inv, step_inv, g_shape = \
                    fastddc.fastddc_inv_dynamic_block(self.ddc, c)
                # host-side G matrix; per-channel column blocks
                # (phase-classed layout, see dynamic_channel_cols)
                self.fold_np = np.zeros(g_shape, np.complex64)
                self._block_cols = g_shape[-1] // c
                self.rate_np = np.zeros((c,), np.float32)
                self.state = (fwd.init(), init_inv())

                def step(state, x, f_re, f_im, rates):
                    fwd_st, inv_st = state
                    fwd_st, spectra = fwd.apply(fwd_st, x)
                    inv_st, out = step_inv(inv_st, spectra, CF(f_re, f_im),
                                           rates)
                    return (fwd_st, inv_st), out.data, out.count

            self._step = jax.jit(step)
        elif method == "td":
            from csdr_tpu import firdes
            from csdr_tpu.ops import fir, shift as shift_ops
            taps = firdes.firdes_lowpass_f(
                firdes.firdes_filter_len(transition_bw), 0.5 / decimation)
            t = len(taps)
            tail_len = ((t - 1 + decimation - 1) // decimation) * decimation
            self.chunk_in = frames * 4096 - (frames * 4096) % decimation
            self.rate_np = np.zeros((c,), np.float32)
            taps_j = jnp.asarray(taps)

            def init():
                return (jnp.zeros((c,), jnp.float32),           # NCO phase
                        CF(jnp.zeros((c, tail_len), jnp.float32),
                           jnp.zeros((c, tail_len), jnp.float32)))

            self.state = init()

            def one(xre, xim, rate, phase, tail_re, tail_im):
                xcat = CF(jnp.concatenate([tail_re, xre]),
                          jnp.concatenate([tail_im, xim]))
                # the carried phase is the NCO phase at the TAIL's first
                # sample: the overlap re-shifts at its original phases and
                # the carry advances by only the n NEW samples (advancing
                # by tail_len+n would jump the output phase tail_len*rate
                # cycles every chunk — same convention as shift_block)
                y, _ = shift_ops.shift_cc(xcat, rate, phase)
                dec = fir.fir_decimate_cc(y, taps_j, decimation)
                n = xre.shape[0]
                k = n // decimation
                # valid-mode emits n/D+1 outputs when (T-1) % D != 0; the
                # extra one duplicates the next chunk's first output (same
                # slice as fir_decimate_block, ops/fir.py)
                # digit-split frac: rate is traced (per-channel retunes), a
                # naive f32 n*rate loses ~n*eps cycles into the carry per chunk
                nphase = shift_ops._wrap_phase(
                    phase + 2.0 * np.pi * shift_ops._frac_mul(n, rate, n + 1))
                return (dec.re[:k], dec.im[:k], nphase,
                        xcat.re[n:], xcat.im[n:])

            def step(state, x, rates):
                phases, tails = state
                # broadcast the shared wideband chunk over channels; the
                # shift un-mixes each channel before the shared-taps FIR
                xr = jnp.broadcast_to(x.re, (c, x.shape[0]))
                xi = jnp.broadcast_to(x.im, (c, x.shape[0]))
                yr, yi, nph, tr, ti = jax.vmap(one)(
                    xr, xi, rates, phases, tails.re, tails.im)
                n_out = yr.shape[1]
                return (nph, CF(tr, ti)), CF(yr, yi), \
                    jnp.full((c,), n_out, jnp.int32)

            self._step = jax.jit(step)
        else:
            raise ValueError(f"unknown method {method!r}")

    # ---- slot management -------------------------------------------------

    def _claim_slot(self, sock) -> _Client | None:
        with self.lock:
            used = {cl.slot for cl in self.clients.values()}
            free = [i for i in range(self.max_channels) if i not in used]
            if not free:
                return None
            slot = free[0]
            cl = _Client(sock, slot)
            self.clients[id(cl)] = cl
            self._set_shift_locked(slot, 0.0)
            return cl

    def _release(self, cl: _Client):
        with self.lock:
            # idempotent: both the rx and tx threads call this on a normal
            # disconnect; only the FIRST caller (which still finds cl in the
            # registry) zeroes the slot — by the second call the slot may
            # already belong to a NEW client, which must not lose its tune
            if self.clients.pop(id(cl), None) is not None:
                self._zero_slot_locked(cl.slot)
        cl.stop()

    def _set_shift_locked(self, slot: int, rate: float):
        if self.method == "fastddc":
            from csdr_tpu.ops import fastddc
            if self.factored:
                tq2_row, d_row, cyc = fastddc.dynamic_channelizer_rows(
                    self.ddc, rate)
                self.tq_np[slot] = tq2_row
                self.d_np[slot] = d_row
                self.rate_np[slot] = cyc
            else:
                w = self._block_cols
                g, cyc = fastddc.dynamic_channel_cols(self.ddc, rate,
                                                      spectra_order="kernel")
                self.fold_np[..., slot * w:(slot + 1) * w] = g
                self.rate_np[slot] = cyc
        else:
            # reference convention: td method feeds `shift=` straight into
            # shift_addfast_cc (mix by +rate), so a channel centered at -rate
            # comes to baseband — identical to the fastddc method's sign
            self.rate_np[slot] = rate
        self.dirty = True

    def set_shift(self, slot: int, rate: float):
        with self.lock:
            self._set_shift_locked(slot, rate)

    # ---- client threads ----------------------------------------------------

    def _client_rx(self, cl: _Client):
        """Parse newline text commands from the client socket."""
        buf = b""
        try:
            while cl.alive:
                data = cl.sock.recv(1024)
                if not data:
                    break
                buf += data
                while b"\n" in buf:
                    line, buf = buf.split(b"\n", 1)
                    self._handle_cmd(cl, line.decode(errors="replace").strip())
        except OSError:
            pass
        self._release(cl)

    def _handle_cmd(self, cl: _Client, line: str):
        if line.startswith("shift="):
            try:
                rate = float(line[6:])
            except ValueError:
                return
            sys.stderr.write(f"ddcd: slot {cl.slot} shift={rate}\n")
            self.set_shift(cl.slot, rate)
        elif line.startswith("bypass="):
            cl.bypass = line[7:].strip() == "1"
            sys.stderr.write(f"ddcd: slot {cl.slot} bypass={cl.bypass}\n")

    def _client_tx(self, cl: _Client):
        try:
            while True:
                with cl.cond:
                    while not cl.queue and cl.alive:
                        cl.cond.wait()
                    if not cl.alive and not cl.queue:
                        break
                    data = cl.queue.popleft()
                cl.sock.sendall(data)
        except OSError:
            pass
        self._release(cl)
        try:
            cl.sock.close()
        except OSError:
            pass

    def _accept_loop(self, lsock):
        while self.running:
            try:
                sock, _ = lsock.accept()
            except OSError:
                break
            cl = self._claim_slot(sock)
            if cl is None:
                sys.stderr.write("ddcd: no free channel slots\n")
                sock.close()
                continue
            sys.stderr.write(f"ddcd: client -> slot {cl.slot}\n")
            threading.Thread(target=self._client_rx, args=(cl,),
                             daemon=True).start()
            threading.Thread(target=self._client_tx, args=(cl,),
                             daemon=True).start()

    # ---- device loop -------------------------------------------------------

    def _run_chunk(self, x_np: np.ndarray):
        """x_np: complex64 (chunk_in,). Returns (data (C, cap) c64, counts)."""
        jnp, CF = self.jnp, self.CF
        x = CF(jnp.asarray(x_np.real), jnp.asarray(x_np.imag))
        with self.lock:
            if self.dirty:
                if self.method == "fastddc" and self.factored:
                    self._dev = (jnp.asarray(self.tq_np.real),
                                 jnp.asarray(self.tq_np.imag),
                                 jnp.asarray(self.d_np.real),
                                 jnp.asarray(self.d_np.imag),
                                 jnp.asarray(self.rate_np))
                elif self.method == "fastddc":
                    self._dev = (jnp.asarray(self.fold_np.real),
                                 jnp.asarray(self.fold_np.imag),
                                 jnp.asarray(self.rate_np))
                else:
                    self._dev = (jnp.asarray(self.rate_np),)
                self.dirty = False
            dev = self._dev
        self.state, data, counts = self._step(self.state, x, *dev)
        dr = np.asarray(data.re)
        di = np.asarray(data.im)
        return dr, di, np.asarray(counts)


    # ---- shared device-loop plumbing --------------------------------------

    def _chunks(self, stdin):
        """Yield (x complex64 ndarray, raw bytes) whole input chunks; stops
        at EOF / short read (both fronts share this framing)."""
        bytes_per = 8
        pending = b""
        while True:
            data = stdin.read(self.chunk_in * bytes_per - len(pending))
            if not data:
                return
            pending += data
            if len(pending) < self.chunk_in * bytes_per:
                continue
            x = np.frombuffer(pending, np.complex64)
            raw = pending
            pending = b""
            yield x, raw

    @staticmethod
    def _slot_payload(dr, di, counts, slot: int) -> bytes:
        """Interleave one slot's decimated output as f32 I/Q bytes."""
        n = int(counts[slot])
        out = np.empty((n, 2), np.float32)
        out[:, 0] = dr[slot, :n]
        out[:, 1] = di[slot, :n]
        return out.tobytes()

    def serve(self, stdin=None, input_url: str | None = None):
        """input_url: 'tcp://host:port' connects the wideband input to a
        remote stream (e.g. an nmux server) instead of stdin — the
        composition the reference runs as `nc host port | ddcd` or via
        nmux fan-out."""
        if input_url:
            assert input_url.startswith("tcp://"), input_url
            host, port = input_url[6:].rsplit(":", 1)
            insock = socket.create_connection((host, int(port)), timeout=30)
            insock.settimeout(None)   # 30 s is the CONNECT timeout only: a
            # lingering recv timeout would crash serve() on any >30 s input
            # stall (source retune, upstream hiccup)
            stdin = insock.makefile("rb")
        stdin = stdin or sys.stdin.buffer
        lsock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        lsock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        lsock.bind((self.address, self.port))
        lsock.listen(16)
        sys.stderr.write(
            f"ddcd: listening on {self.address}:{self.port} "
            f"method={self.method} D={self.decimation} "
            f"chunk={self.chunk_in}\n")
        threading.Thread(target=self._accept_loop, args=(lsock,),
                         daemon=True).start()
        try:
            for x, raw in self._chunks(stdin):
                dr, di, counts = self._run_chunk(x)
                with self.lock:
                    clients = list(self.clients.values())
                for cl in clients:
                    cl.push(raw if cl.bypass
                            else self._slot_payload(dr, di, counts, cl.slot))
        finally:
            self.running = False
            lsock.close()
            with self.lock:
                clients = list(self.clients.values())
            for cl in clients:
                cl.stop()


    # ---- native front-end mode ------------------------------------------

    def serve_native(self, front_bin: str, stdin=None,
                     input_url: str | None = None):
        """Serve through the native ddcd_front child process
        (native/ddcd_front.cpp): the C++ front owns the listen socket,
        client sockets, command parsing, and per-client drop-oldest
        queues; this process only runs the device loop and writes framed
        per-slot payloads — client churn and slow readers never touch the
        GIL or the step cadence."""
        import struct
        import subprocess

        if input_url:
            assert input_url.startswith("tcp://"), input_url
            host, port = input_url[6:].rsplit(":", 1)
            insock = socket.create_connection((host, int(port)), timeout=30)
            insock.settimeout(None)   # 30 s is the CONNECT timeout only: a
            # lingering recv timeout would crash serve() on any >30 s input
            # stall (source retune, upstream hiccup)
            stdin = insock.makefile("rb")
        stdin = stdin or sys.stdin.buffer
        front = subprocess.Popen(
            [front_bin, "--port", str(self.port), "--address", self.address,
             "--slots", str(self.max_channels)],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE)
        active: dict[int, bool] = {}          # slot -> bypass flag

        def events():
            for raw in front.stdout:
                parts = raw.decode(errors="replace").strip().split(" ", 2)
                if len(parts) < 2:
                    continue
                try:
                    ev, slot = parts[0], int(parts[1])
                except ValueError:
                    # one malformed front line must not kill the events
                    # thread (it would silently freeze connect/retune/close
                    # handling while the device loop keeps streaming)
                    sys.stderr.write(f"ddcd: bad front event {raw!r}\n")
                    continue
                if ev == "connect":
                    with self.lock:
                        self._set_shift_locked(slot, 0.0)
                        active[slot] = False
                    sys.stderr.write(f"ddcd: client -> slot {slot}\n")
                elif ev == "close":
                    with self.lock:
                        active.pop(slot, None)
                        self._zero_slot_locked(slot)
                    sys.stderr.write(f"ddcd: slot {slot} released\n")
                elif ev == "line" and len(parts) == 3:
                    line = parts[2]
                    if line.startswith("shift="):
                        try:
                            self.set_shift(slot, float(line[6:]))
                            sys.stderr.write(
                                f"ddcd: slot {slot} {line}\n")
                        except ValueError:
                            pass
                    elif line.startswith("bypass="):
                        with self.lock:
                            if slot in active:
                                active[slot] = line[7:].strip() == "1"

        threading.Thread(target=events, daemon=True).start()
        try:
            for x, raw in self._chunks(stdin):
                dr, di, counts = self._run_chunk(x)
                with self.lock:
                    snapshot = dict(active)
                for slot, bypass in snapshot.items():
                    payload = (raw if bypass
                               else self._slot_payload(dr, di, counts, slot))
                    try:
                        front.stdin.write(
                            struct.pack("<II", slot, len(payload)) + payload)
                        front.stdin.flush()
                    except (BrokenPipeError, OSError):
                        return
        finally:
            self.running = False
            try:
                front.stdin.close()
            except OSError:
                pass
            front.wait(timeout=10)

    def _zero_slot_locked(self, slot: int):
        """Release a slot's device arrays (native-front mode)."""
        if self.method == "fastddc":
            if self.factored:
                self.tq_np[slot] = 0.0
                self.d_np[slot] = 0.0
            else:
                w = self._block_cols
                self.fold_np[..., slot * w:(slot + 1) * w] = 0.0
        self.rate_np[slot] = 0.0
        self.dirty = True


def default_front_bin() -> str | None:
    import os
    cand = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                        "build", "ddcd_front")
    cand = os.path.abspath(cand)
    return cand if os.path.exists(cand) else None


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--port", type=int, default=4953)
    ap.add_argument("--address", default="127.0.0.1")
    ap.add_argument("--decimation", type=int, required=True)
    ap.add_argument("--bw", type=float, default=0.05,
                    help="transition bandwidth")
    ap.add_argument("--method", choices=["fastddc", "td"], default="fastddc")
    ap.add_argument("--max_channels", type=int, default=8)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--input", default=None,
                    help="tcp://host:port wideband input (e.g. from nmux); "
                         "default stdin")
    ap.add_argument("--front", choices=["py", "native"], default="py",
                    help="client-facing socket layer: 'py' serves in-process "
                         "threads; 'native' spawns native/build/ddcd_front "
                         "(C++), keeping client churn off the device loop")
    args = ap.parse_args(argv)
    import os
    if os.environ.get("JAX_PLATFORMS"):
        # sitecustomize preloads jax with its own platform; honor the env
        # var like a fresh process would (same dance as cli.main)
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    srv = DdcdServer(args.decimation, args.bw, args.max_channels,
                     args.method, args.frames, args.port, args.address)
    if args.front == "native":
        front = default_front_bin()
        if front is None:
            sys.stderr.write("ddcd: native front not built "
                             "(run `make -C native`)\n")
            return 1
        srv.serve_native(front, input_url=args.input)
    else:
        srv.serve(input_url=args.input)
    return 0


if __name__ == "__main__":
    sys.exit(main())
