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


def test_bpsk31_ber_degrades_gracefully():
    ber_hi, _ = bpsk31.ber_at_snr(14.0, nchars=100)
    ber_lo, _ = bpsk31.ber_at_snr(0.0, nchars=100)
    assert ber_lo > ber_hi  # monotone-ish: noise hurts
    assert ber_hi < 0.05
