"""BPSK31 TX/RX chains + BER harness — BASELINE config 5's modem half,
reproducing the reference's end-to-end acceptance test
(grc_tests/bpsk31_ber.py:16-26; SURVEY.md §3.4):

TX: psk31_varicode_encoder | differential_encoder | psk_modulator_u8_c 2
    | psk31_interpolate_sine_cc 256 | awgn_cc <snr>
RX: timing_recovery_cc GARDNER 256 0.5 2 --add_q | dbpsk_decoder_c_u8
"""

from __future__ import annotations

import numpy as np

from csdr_tpu.core import cplx
from csdr_tpu.core.cplx import CF
from csdr_tpu.ops import digital, noise as noise_ops, sync


def tx_chain(text: bytes, interpolation: int = 256) -> tuple[np.ndarray, CF]:
    """Text -> (bit stream u8, baseband CF)."""
    bits = digital.psk31_varicode_encoder_u8_u8(
        np.frombuffer(text, np.uint8))
    enc, _ = digital.differential_codec_encode(bits)
    symbols = digital.psk_modulator_u8_c(np.asarray(enc), 2)
    bb, _ = digital.psk31_interpolate_sine_cc(symbols, interpolation)
    return bits, bb


def rx_chain(x: CF, interpolation: int = 256, chunk: int | None = None) -> np.ndarray:
    """Baseband -> recovered bit stream (u8)."""
    blk = sync.timing_recovery_block("GARDNER", interpolation,
                                     loop_gain=0.5, max_error=2.0, use_q=True)
    st = blk.init()
    n = x.shape[0]
    chunk = chunk or n
    syms = []
    for c in range(n // chunk):
        st, out = blk.apply(st, x[c * chunk:(c + 1) * chunk])
        m = int(np.asarray(out.count))
        syms.append(cplx.to_numpy(out.data)[:m])
    symbols = np.concatenate(syms).astype(np.complex64)
    bits, _ = digital.dbpsk_decoder_c_u8(cplx.from_numpy(symbols))
    return np.asarray(bits)


def ber_at_snr(snr_db: float, nchars: int = 400, seed: int = 0,
               message: bytes = b"CQ CQ CQ DE HA7ILM HA7ILM HA7ILM PSE K ") -> tuple[float, int]:
    """One point of the reference BER curve (bpsk31_ber.py:45-53): generate,
    add AWGN at snr_db, receive, bit-compare with +-5 alignment search.
    Returns (ber, total_bits)."""
    text = (message * (nchars // len(message) + 1))[:nchars]
    bits_in, bb = tx_chain(text)
    noisy = noise_ops.awgn_cc(bb, snr_db, seed=seed)
    bits_out = rx_chain(noisy)
    best = None
    for shift in range(-5, 5):
        a, b = bits_in, bits_out
        if shift < 0:
            a = np.concatenate([np.zeros(-shift, np.uint8), a])
        elif shift > 0:
            b = np.concatenate([np.zeros(shift, np.uint8), b])
        m = min(len(a), len(b))
        errs = int(np.sum(a[:m] != b[:m]))
        if best is None or errs < best[0]:
            best = (errs, m)
    return best[0] / best[1], best[1]


def ber_curve(snrs=range(0, 20, 2), nchars: int = 400, seed: int = 0):
    """Full `snr; errors; totalbits; BER` sweep like bpsk31_ber.py."""
    rows = []
    for snr in snrs:
        ber, total = ber_at_snr(snr, nchars, seed)
        rows.append((snr, int(ber * total), total, ber))
    return rows
