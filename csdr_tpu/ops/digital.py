"""Digital modem blocks: PSK31 varicode, RTTY baudot, slicers, PSK modulator,
differential coding, DBPSK, BFSK, bit (de)serialization (SURVEY.md §2.9).
Byte-domain blocks are bit-exact vs the reference.

TPU notes:
- the varicode DECODER is a pure sliding-window pattern match, so unlike the
  reference's per-bit shift register (libcsdr.c:1474-1487) it vectorizes
  completely: one rolling-window value per length class, compared against all
  codes at once.
- differential coding is a cumulative-parity (encode) / shift-compare
  (decode), both parallel, replacing the reference's serial loops
  (libcsdr.c:1828-1843).
- the varicode ENCODER and the serial line decoder are variable-rate,
  data-dependent byte jobs at symbol rates (~31 baud); they run host-side in
  numpy by design (they are stream sources/sinks, not device hot loops).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from csdr_tpu.core.block import VarOut
from csdr_tpu.core.cplx import CF, expj
from csdr_tpu.ops._varicode_table import VARICODE


# --------------------------------------------------------------------------
# PSK31 varicode
# --------------------------------------------------------------------------

def psk31_varicode_encoder_u8_u8(text: np.ndarray) -> np.ndarray:
    """ASCII bytes -> bit stream (one u8 per bit), each character's code
    followed by two 0 separator bits (reference libcsdr.c:1489-1514).
    Host-side numpy (source-side codec at symbol rate)."""
    out = []
    for ch in np.asarray(text, np.uint8):
        code, bits = VARICODE[int(ch)]
        for bi in range(bits):
            out.append((code >> (bits - bi - 1)) & 1)
        out.extend((0, 0))
    return np.asarray(out, np.uint8)


def _varicode_decode_tables():
    """Group codes by window length L = bitcount + 4; for each L build the
    expected window value 00<code>00 (the reference's shr & mask comparison,
    libcsdr.c:1480-1485)."""
    groups = {}
    for ascii_val, (code, bits) in enumerate(VARICODE):
        l = bits + 4
        groups.setdefault(l, []).append((code << 2, ascii_val))
    return groups


_VC_GROUPS = _varicode_decode_tables()


def psk31_varicode_decoder_u8_u8(bits, max_out: int | None = None,
                                 skip: int = 0):
    """Bit stream -> VarOut of ASCII bytes.  Fully parallel window match.

    Matches the reference exactly: a character is emitted at bit n when the
    window of the last (bitcount+4) bits equals 00<code>00.  (Like the
    reference, a code that is a suffix-context match of another emits both —
    the table is prefix-free under the 00 framing so this does not occur.)

    ``skip``: suppress matches ending at bit index < skip.  Streaming
    callers prepend the previous chunk's last history bits so boundary-
    spanning codes match; matches that END inside that prepended history
    were already emitted by the previous chunk and must not re-emit.
    """
    bits = jnp.asarray(bits, jnp.int32) & 1
    n = bits.shape[0]
    cap = max_out or n // 6 + 8
    ascii_hit = jnp.zeros((n,), jnp.int32)
    hit = jnp.zeros((n,), bool)
    for l, codes in _VC_GROUPS.items():
        # rolling L-bit window value ending at each n (MSB = oldest)
        pw = jnp.asarray([1 << (l - 1 - k) for k in range(l)], jnp.int32)
        padded = jnp.concatenate([jnp.ones((l - 1,), jnp.int32), bits])
        idx = jnp.arange(n)[:, None] + jnp.arange(l)[None, :]
        win = (padded[idx] * pw[None, :]).sum(axis=1)
        for value, ascii_val in codes:
            m = win == value
            hit = hit | m
            ascii_hit = jnp.where(m, ascii_val, ascii_hit)
    if skip:
        hit = hit & (jnp.arange(n) >= skip)
    # stream compaction into capacity buffer
    pos = jnp.cumsum(hit.astype(jnp.int32)) - 1
    tgt = jnp.where(hit & (pos < cap), pos, cap)
    data = jnp.zeros((cap + 1,), jnp.int32).at[tgt].set(ascii_hit, mode="drop")
    count = jnp.minimum(jnp.sum(hit.astype(jnp.int32)), cap)
    return VarOut(data[:cap].astype(jnp.uint8), count)


# --------------------------------------------------------------------------
# RTTY baudot (reference libcsdr.c:1576-1654)
# --------------------------------------------------------------------------

# 5-bit code -> (letters, figures); codes not present map to 0.
# This is the public ITA2/US-TTY alphabet (also reference libcsdr.c:1576-1608)
_BAUDOT_PAIRS = {
    0b00000: (0, 0), 0b10000: ("E", "3"), 0b01000: ("\n", "\n"),
    0b11000: ("A", "-"), 0b00100: (" ", " "), 0b10100: ("S", "'"),
    0b01100: ("I", "8"), 0b11100: ("U", "7"), 0b00010: ("\r", "\r"),
    0b10010: ("D", "#"), 0b01010: ("R", "4"), 0b11010: ("J", "\a"),
    0b00110: ("N", ","), 0b10110: ("F", "@"), 0b01110: ("C", ":"),
    0b11110: ("K", "("), 0b00001: ("T", "5"), 0b10001: ("Z", "+"),
    0b01001: ("L", ")"), 0b11001: ("W", "2"), 0b00101: ("H", "$"),
    0b10101: ("Y", "6"), 0b01101: ("P", "0"), 0b11101: ("Q", "1"),
    0b00011: ("O", "9"), 0b10011: ("B", "?"), 0b01011: ("G", "*"),
    0b00111: ("M", "."), 0b10111: ("X", "/"), 0b01111: ("V", "="),
}
RTTY_FIGURE_MODE_SELECT_CODE = 0b11011
RTTY_LETTER_MODE_SELECT_CODE = 0b11111

_BAUDOT_LETTERS = np.zeros(32, np.int32)
_BAUDOT_FIGURES = np.zeros(32, np.int32)
for _code, (_l, _f) in _BAUDOT_PAIRS.items():
    _BAUDOT_LETTERS[_code] = ord(_l) if isinstance(_l, str) else _l
    _BAUDOT_FIGURES[_code] = ord(_f) if isinstance(_f, str) else _f

# decoder states (reference libcsdr.h:243-248)
_WAIT_STOP, _WAIT_START, _RECV = 0, 1, 2


def rtty_baudot_decoder(symbols, max_out: int | None = None, state=None):
    """Bit symbols -> VarOut of ASCII, with the reference's start/stop-pulse
    state machine (libcsdr.c:1622-1654) as a lax.scan (serial, bit-exact).

    state = (machine_state, fig_mode, shr, bit_cntr, char_received);
    returns (VarOut, state')."""
    symbols = (jnp.asarray(symbols, jnp.int32) != 0).astype(jnp.int32)
    n = symbols.shape[0]
    cap = max_out or n // 7 + 4
    letters = jnp.asarray(_BAUDOT_LETTERS)
    figures = jnp.asarray(_BAUDOT_FIGURES)
    if state is None:
        state = (jnp.int32(_WAIT_STOP), jnp.int32(0), jnp.int32(0),
                 jnp.int32(0), jnp.int32(0))

    def step(carry, sym):
        st, fig, shr, cnt, rcvd = carry
        # WAITING_STOP_PULSE
        code = shr & 31
        is_fig_sel = code == RTTY_FIGURE_MODE_SELECT_CODE
        is_let_sel = code == RTTY_LETTER_MODE_SELECT_CODE
        ch = jnp.where(fig != 0, figures[code], letters[code])
        emit_stop = (st == _WAIT_STOP) & (sym == 1) & (rcvd != 0) & \
                    (~is_fig_sel) & (~is_let_sel)
        fig_stop = jnp.where((st == _WAIT_STOP) & (sym == 1) & (rcvd != 0),
                             jnp.where(is_fig_sel, 1,
                                       jnp.where(is_let_sel, 0, fig)), fig)
        st_stop = jnp.where(sym == 1, _WAIT_START, _WAIT_STOP)
        rcvd_stop = jnp.where(sym == 1, rcvd, 0)
        # WAITING_START_PULSE
        st_start = jnp.where(sym == 0, _RECV, _WAIT_START)
        shr_start = jnp.where(sym == 0, 0, shr)
        cnt_start = jnp.where(sym == 0, 0, cnt)
        # RECEIVING_DATA
        shr_recv = ((shr << 1) | sym) & 0xFFFF
        done = cnt == 4
        st_recv = jnp.where(done, _WAIT_STOP, _RECV)
        rcvd_recv = jnp.where(done, 1, rcvd)
        cnt_recv = cnt + 1

        new_st = jnp.where(st == _WAIT_STOP, st_stop,
                           jnp.where(st == _WAIT_START, st_start, st_recv))
        new_fig = jnp.where(st == _WAIT_STOP, fig_stop, fig)
        new_shr = jnp.where(st == _RECV, shr_recv,
                            jnp.where(st == _WAIT_START, shr_start, shr))
        new_cnt = jnp.where(st == _RECV, cnt_recv,
                            jnp.where(st == _WAIT_START, cnt_start, cnt))
        new_rcvd = jnp.where(st == _WAIT_STOP, rcvd_stop,
                             jnp.where(st == _WAIT_START, 0, rcvd_recv))
        emit = (st == _WAIT_STOP) & emit_stop & (ch != 0)
        return (new_st, new_fig, new_shr, new_cnt, new_rcvd), (emit, ch)

    state, (emits, chars) = jax.lax.scan(step, state, symbols)
    pos = jnp.cumsum(emits.astype(jnp.int32)) - 1
    tgt = jnp.where(emits & (pos < cap), pos, cap)
    data = jnp.zeros((cap + 1,), jnp.int32).at[tgt].set(chars, mode="drop")
    count = jnp.minimum(jnp.sum(emits.astype(jnp.int32)), cap)
    return VarOut(data[:cap].astype(jnp.uint8), count), state


def rtty_baudot2ascii_u8_u8(codes, fig_mode=0):
    """Direct 5-bit baudot codes -> ASCII (reference
    rtty_baudot_decoder_lookup, libcsdr.c:1613-1621).  Unlike the
    reference's per-char call, the figures/letters mode is a carried prefix
    state computed in parallel: a cummax over the indices of mode-select
    codes gives each position its governing select code.

    Returns (VarOut ascii, fig_mode')."""
    c = jnp.asarray(codes, jnp.int32) & 31
    n = c.shape[0]
    is_fig = c == RTTY_FIGURE_MODE_SELECT_CODE
    is_ltr = c == RTTY_LETTER_MODE_SELECT_CODE
    sel = is_fig | is_ltr
    idx = jnp.where(sel, jnp.arange(n, dtype=jnp.int32), -1)
    last_sel = jax.lax.cummax(idx)
    sel_mode = is_fig.astype(jnp.int32)
    mode = jnp.where(last_sel >= 0, sel_mode[jnp.maximum(last_sel, 0)],
                     jnp.asarray(fig_mode, jnp.int32))
    letters = jnp.asarray(_BAUDOT_LETTERS)
    figures = jnp.asarray(_BAUDOT_FIGURES)
    ch = jnp.where(mode != 0, figures[c], letters[c])
    emit = (~sel) & (ch != 0)
    pos = jnp.cumsum(emit.astype(jnp.int32)) - 1
    tgt = jnp.where(emit, pos, n)
    data = jnp.zeros((n + 1,), jnp.int32).at[tgt].set(ch, mode="drop")
    count = jnp.sum(emit.astype(jnp.int32))
    new_mode = mode[-1] if n > 0 else jnp.asarray(fig_mode, jnp.int32)
    return VarOut(data[:n].astype(jnp.uint8), count), new_mode


# --------------------------------------------------------------------------
# slicers / modulators / bit plumbing
# --------------------------------------------------------------------------

def binary_slicer_f_u8(x):
    """x > 0 -> 1 (reference libcsdr.c:1768-1770)."""
    return (x > 0).astype(jnp.uint8)


def generic_slicer_f_u8(x, n_symbols: int):
    """N-level slicer over [-1, 1] (reference libcsdr.c:1731-1766)."""
    dist = 2.0 / (n_symbols - 1)
    j = jnp.round((x + 1.0) / dist).astype(jnp.int32)
    return jnp.clip(j, 0, n_symbols - 1).astype(jnp.uint8)


def psk_modulator_u8_c(symbols, n_psk: int) -> CF:
    """symbol k -> e^{j*2*pi*k/N} (reference libcsdr.c:1772-1782)."""
    phase = (2 * np.pi / n_psk) * jnp.asarray(symbols, jnp.float32)
    return expj(phase)


def duplicate_samples_ntimes_u8_u8(x, sample_size_bytes: int, ntimes: int):
    """reference libcsdr.c:1784-1791"""
    g = x.reshape(-1, sample_size_bytes)
    return jnp.repeat(g, ntimes, axis=0).reshape(-1)


def psk31_interpolate_sine_cc(x: CF, interpolation: int,
                              last_input: CF | None = None):
    """Cosine-envelope symbol interpolation (reference libcsdr.c:1793-1808):
    output[i*I+j] = x[i]*rate_j + x[i-1]*(1-rate_j),
    rate_j = (1+sin(-pi/2 + pi*(j+1)/I))/2.  Returns (y, new_last)."""
    if last_input is None:
        last_input = CF.scalar(0.0)
    j = np.arange(interpolation, dtype=np.float64)
    rate = ((1 + np.sin(-np.pi / 2 + np.pi * (j + 1) / interpolation)) / 2).astype(np.float32)
    rate = jnp.asarray(rate)[None, :]
    prev_re = jnp.concatenate([jnp.reshape(last_input.re, (1,)), x.re[:-1]])
    prev_im = jnp.concatenate([jnp.reshape(last_input.im, (1,)), x.im[:-1]])
    yre = x.re[:, None] * rate + prev_re[:, None] * (1 - rate)
    yim = x.im[:, None] * rate + prev_im[:, None] * (1 - rate)
    return CF(yre.reshape(-1), yim.reshape(-1)), x[-1]


def pack_bits_1to8_u8_u8(x):
    """Each byte -> 8 bit-bytes, LSB first (reference libcsdr.c:1810-1815)."""
    b = jnp.asarray(x, jnp.uint8)[:, None]
    k = jnp.arange(8, dtype=jnp.uint8)[None, :]
    return ((b >> k) & 1).reshape(-1)


def pack_bits_8to1_u8_u8(bits):
    """8 bit-bytes -> 1 byte, first bit = MSB (reference libcsdr.c:1818-1827)."""
    g = (jnp.asarray(bits, jnp.int32) != 0).astype(jnp.int32).reshape(-1, 8)
    w = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.int32)
    return (g * w).sum(axis=1).astype(jnp.uint8)


def invert_u8_u8(x):
    return (1 - (jnp.asarray(x, jnp.int32) & 1)).astype(jnp.uint8)


def differential_codec_encode(x, state=0):
    """Encode: state toggles on 0-bits (reference libcsdr.c:1834-1841).
    out[n] = state0 XOR parity(# zeros up to n).  Parallel cumsum."""
    x = (jnp.asarray(x, jnp.int32) != 0).astype(jnp.int32)
    flips = jnp.cumsum(1 - x) & 1
    out = (jnp.asarray(state, jnp.int32) ^ flips) & 1
    return out.astype(jnp.uint8), out[-1]


def differential_codec_decode(x, state=0):
    """Decode: out[n] = (x[n] == x[n-1]) with x[-1]=state
    (reference libcsdr.c:1828-1833).  Returns (out, new_state=x[-1])."""
    x = (jnp.asarray(x, jnp.int32) != 0).astype(jnp.int32)
    prev = jnp.concatenate([jnp.reshape(jnp.asarray(state, jnp.int32), (1,)), x[:-1]])
    return (x == prev).astype(jnp.uint8), x[-1]


def dbpsk_decoder_c_u8(x: CF, last_input: CF | None = None, count=None):
    """|dphase| > pi/2 -> 0 else 1 (reference libcsdr.c:2319-2333).
    Returns (bits, new_last).

    count: when x is a VarOut-padded stream (valid prefix of ``count``
    symbols), pass it so new_last is the last VALID symbol instead of a
    pad zero — a pad-zero last corrupts the first bit of the next chunk
    (phase(0,0) = 0).  None keeps the whole-array contract (CLI pump)."""
    if last_input is None:
        last_input = CF.scalar(0.0)
    phase = x.angle()
    prev_phase = jnp.concatenate([
        jnp.reshape(jnp.arctan2(last_input.im, last_input.re), (1,)), phase[:-1]])
    d = phase - prev_phase
    d = jnp.where(d < -np.pi, d + 2 * np.pi, d)
    d = jnp.where(d >= np.pi, d - 2 * np.pi, d)
    bits = ((d <= np.pi / 2) & (d >= -np.pi / 2)).astype(jnp.uint8)
    if count is None:
        return bits, x[-1]
    lv = x[jnp.maximum(count - 1, 0)]
    keep = count > 0
    new_last = CF(jnp.where(keep, lv.re, last_input.re),
                  jnp.where(keep, lv.im, last_input.im))
    return bits, new_last


def bfsk_demod_cf(x: CF, mark_filter: CF, space_filter: CF):
    """|mark FIR|^2 - |space FIR|^2 (reference libcsdr.c:2335-2351)."""
    from csdr_tpu.ops.fir import apply_fir_cc

    m = apply_fir_cc(x, mark_filter)
    s = apply_fir_cc(x, space_filter)
    return (m.abs2() - s.abs2()).astype(jnp.float32)


def normalized_timing_variance_u32_f(indexes, samples_per_symbol: int,
                                     initial_sample_offset: int):
    """TED quality metric (reference libcsdr.c:2293-2317): variance of the
    sampled indexes' deviation from the ideal comb, in radians^2."""
    inp = jnp.asarray(indexes, jnp.int32)
    rel = inp - initial_sample_offset
    nearest = rel // samples_per_symbol
    rem = rel % samples_per_symbol
    nearest = jnp.where(rem > samples_per_symbol // 2, nearest + 1, nearest)
    correct = initial_sample_offset + nearest * samples_per_symbol
    ndiff = jnp.abs(correct - inp).astype(jnp.float32) / samples_per_symbol
    nrad = ndiff * np.pi
    mean = jnp.mean(nrad)
    n = inp.shape[0]
    return jnp.sum((nrad - mean) ** 2) / (n - 1)


# --------------------------------------------------------------------------
# software UART (host-side: data-dependent scan at symbol rate)
# --------------------------------------------------------------------------

def serial_line_decoder_f_u8(x: np.ndarray, samples_per_bits: float,
                             databits: int = 8, stopbits: float = 1.0,
                             bit_sampling_width_ratio: float = 0.4):
    """Software UART (reference libcsdr.c:1656-1729): edge-find the start
    bit, integrate bit windows, verify the stop bit.  Host numpy (the rates
    are bytes/sec; this is a stream sink).  Returns (bytes, input_used)."""
    x = np.asarray(x, np.float32)
    out = []
    used = 0
    n = len(x)
    base = 0
    all_bits = 1 + databits + stopbits
    r = bit_sampling_width_ratio
    while True:
        seg = x[base:]
        if len(seg) < 2:
            used = n
            break
        edges = np.nonzero((seg[1:] < 0) & (seg[:-1] > 0))[0] + 1
        if len(edges) == 0:
            used = n
            break
        s = int(edges[0])
        if base + s + samples_per_bits * all_bits >= n:
            used = base + max(0, s - 2)
            break
        shr = 0
        for di in range(databits):
            b0 = base + s + int((1 + di + 0.5 * (1 - r)) * samples_per_bits)
            b1 = base + s + int((1 + di + 0.5 * (1 + r)) * samples_per_bits)
            shr = (shr << 1) | (1 if x[b0:b1].sum() > 0 else 0)
        sb0 = base + s + int((1 + databits) * samples_per_bits
                             + stopbits * 0.5 * (1 - r) * samples_per_bits)
        sb1 = base + s + int((1 + databits) * samples_per_bits
                             + stopbits * 0.5 * (1 + r) * samples_per_bits)
        if x[sb0:sb1].sum() < 0:
            base = min(base + s + 1, n)
            used = base
            continue
        out.append(shr)
        base = min(base + s + int(all_bits * samples_per_bits), n)
        used = base
        if base >= n:
            break
    return np.asarray(out, np.uint32), used


def pattern_search_u8_u8(x: np.ndarray, pattern: np.ndarray, values_after: int):
    """Find every occurrence of ``pattern`` in the byte stream and emit the
    ``values_after`` bytes that follow each match (reference csdr.c:3532-3597;
    used to deframe sync-word protocols).  Host-side (byte sink)."""
    x = np.asarray(x, np.uint8)
    p = np.asarray(pattern, np.uint8)
    lp = len(p)
    if len(x) < lp:
        return np.zeros((0, values_after), np.uint8)
    windows = np.lib.stride_tricks.sliding_window_view(x, lp)
    hits = np.nonzero((windows == p).all(axis=1))[0]
    out = []
    for h in hits:
        seg = x[h + lp: h + lp + values_after]
        if len(seg) == values_after:
            out.append(seg)
    return (np.stack(out) if out else np.zeros((0, values_after), np.uint8))
