"""End-to-end BPSK31 BER — the reference's acceptance harness
(grc_tests/bpsk31_ber.py) rebuilt on the framework."""

import numpy as np
import pytest

from csdr_tpu.models import bpsk31


def test_bpsk31_noiseless_roundtrip():
    text = b"HELLO BPSK31 WORLD 123 " * 10
    bits_in, bb = bpsk31.tx_chain(text)
    bits_out = bpsk31.rx_chain(bb)
    best = None
    for shift in range(-5, 5):
        a, b = bits_in, bits_out
        if shift < 0:
            a = np.concatenate([np.zeros(-shift, np.uint8), a])
        elif shift > 0:
            b = np.concatenate([np.zeros(shift, np.uint8), b])
        m = min(len(a), len(b))
        errs = int(np.sum(a[:m] != b[:m]))
        best = errs if best is None else min(best, errs)
    assert best <= 2, best  # at most edge-symbol slips


def test_bpsk31_ber_high_snr_clean():
    ber, total = bpsk31.ber_at_snr(18.0, nchars=150)
    assert total > 1000  # ~8.4 varicode bits/char
    assert ber < 0.005, ber


def test_bpsk31_ber_high_snr_floor_30k():
    """VERDICT r4 #7: the ~1e-3 residual BER documented at short stream
    lengths (docs/BER.md) is an ACQUISITION-EDGE artifact, not a steady
    state floor.  Proof at >=30k bits (reference harness pattern
    bpsk31_ber.py:45-53, lengthened): total BER < 1e-4 at 18 dB, and
    every error sits in the first TED-warmup bits — the steady-state
    stream (past bit 32) is error-free."""
    from csdr_tpu.ops import noise as noise_ops

    message = b"CQ CQ CQ DE HA7ILM HA7ILM HA7ILM PSE K "
    nchars = 3700                       # ~8.4 varicode bits/char -> >=30k
    text = (message * (nchars // len(message) + 1))[:nchars]
    bits_in, bb = bpsk31.tx_chain(text)
    noisy = noise_ops.awgn_cc(bb, 18.0, seed=0)
    bits_out = bpsk31.rx_chain(noisy)
    best = None
    for shift in range(-5, 5):
        a, b = bits_in, bits_out
        if shift < 0:
            a = np.concatenate([np.zeros(-shift, np.uint8), a])
        elif shift > 0:
            b = np.concatenate([np.zeros(shift, np.uint8), b])
        m = min(len(a), len(b))
        errpos = np.nonzero(a[:m] != b[:m])[0]
        if best is None or len(errpos) < len(best[0]):
            best = (errpos, m)
    errpos, total = best
    assert total >= 30_000, total
    assert len(errpos) / total < 1e-4, (len(errpos), total)
    # acquisition-edge proof: zero errors once the TED has locked
    steady = errpos[errpos >= 32]
    assert steady.size == 0, steady[:20]


def test_bpsk31_ber_degrades_gracefully():
    ber_hi, _ = bpsk31.ber_at_snr(14.0, nchars=100)
    ber_lo, _ = bpsk31.ber_at_snr(0.0, nchars=100)
    assert ber_lo > ber_hi  # monotone-ish: noise hurts
    assert ber_hi < 0.05
