"""Segmented (overlap-discard) timing recovery — the TPU-native parallel
mode of timing_recovery_cc (ops/sync.py, segments > 1).

The serial mode (segments=1) is the reference-parity path and is golden-
tested in test_digital.py; this file certifies the segmented redesign
against the serial mode the way the reference certifies its own modem:
through the BPSK31 BER harness (grc_tests/bpsk31_ber.py pattern) plus
symbol-count/seam checks."""

import numpy as np
import pytest

from csdr_tpu.core import cplx
from csdr_tpu.core.cplx import CF
from csdr_tpu.models import bpsk31
from csdr_tpu.ops import digital, noise as noise_ops, sync

SPS = 256
TEXT = (b"CQ CQ CQ DE HA7ILM HA7ILM PSE K " * 30)[:900]


def _rx_bits(x, segments, chunk=None, warm=32, output="symbols"):
    blk = sync.timing_recovery_block("GARDNER", SPS, 0.5, 2.0, use_q=True,
                                     segments=segments, warmup_symbols=warm,
                                     output=output)
    st = blk.init()
    n = x.shape[0]
    chunk = chunk or n
    outs = []
    for c in range(n // chunk):
        st, out = blk.apply(st, x[c * chunk:(c + 1) * chunk])
        m = int(np.asarray(out.count))
        if output == "symbols":
            outs.append(cplx.to_numpy(out.data)[:m])
        else:
            outs.append(np.asarray(out.data)[:m])
    if output != "symbols":
        return np.concatenate(outs)
    symbols = np.concatenate(outs).astype(np.complex64)
    bits, _ = digital.dbpsk_decoder_c_u8(cplx.from_numpy(symbols))
    return np.asarray(bits)


def _ber(bits_in, bits_out):
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
    return best[0] / best[1]


@pytest.fixture(scope="module")
def fixture_signal():
    bits_in, bb = bpsk31.tx_chain(TEXT)
    return bits_in, bb


@pytest.mark.parametrize("snr", [8.0, 12.0])
def test_segmented_ber_matches_serial(fixture_signal, snr):
    """Whole-chunk segmented decode: BER within noise of the serial loop."""
    bits_in, bb = fixture_signal
    x = noise_ops.awgn_cc(bb, snr, seed=1)
    b_serial = _ber(bits_in, _rx_bits(x, 1))
    b_seg = _ber(bits_in, _rx_bits(x, 8))
    assert b_seg <= b_serial + 0.002, (b_serial, b_seg)


def test_segmented_streaming_chunks(fixture_signal):
    """Chunked streaming (fresh seams every chunk): BER parity and symbol
    count parity with the serial loop."""
    bits_in, bb = fixture_signal
    x = noise_ops.awgn_cc(bb, 10.0, seed=2)
    chunk = x.shape[0] // 4 // SPS * SPS
    b_serial = _ber(bits_in, _rx_bits(x, 1, chunk=chunk))
    b_seg = _ber(bits_in, _rx_bits(x, 8, chunk=chunk))
    assert b_seg <= b_serial + 0.002, (b_serial, b_seg)


def test_segmented_seams_no_slips(fixture_signal):
    """Symbol-position stream has no seam artifacts: every inter-symbol
    gap stays within the loop's legal stride range [nsb-nshb, nsb+nshb]."""
    _, bb = fixture_signal
    x = noise_ops.awgn_cc(bb, 10.0, seed=3)
    pos = _rx_bits(x, 8, output="indexes").astype(np.int64)
    d = np.diff(pos)
    assert d.min() >= SPS - SPS // 2, d.min()
    assert d.max() <= SPS + SPS // 2, d.max()


def test_segmented_symbol_count_close(fixture_signal):
    _, bb = fixture_signal
    x = noise_ops.awgn_cc(bb, 12.0, seed=1)
    n1 = len(_rx_bits(x, 1, output="indexes"))
    n8 = len(_rx_bits(x, 8, output="indexes"))
    assert abs(n1 - n8) <= 4, (n1, n8)


def test_segmented_earlylate_smoke():
    """EARLYLATE variant runs in segmented mode and finds symbols."""
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 400) * 2.0 - 1.0
    bb = np.repeat(bits, 32)
    k = np.hanning(32)
    sm = np.convolve(bb, k / k.sum(), mode="same").astype(np.float32)
    x = CF(cplx.from_numpy(sm.astype(np.complex64)).re,
           np.zeros_like(sm))
    blk = sync.timing_recovery_block("EARLYLATE", 32, segments=4,
                                     warmup_symbols=8)
    _, out = blk.apply(blk.init(), x)
    assert int(np.asarray(out.count)) > 300


def test_segmented_saturation_recovers():
    """Adversarial railed input then a clean stream: the segmented carry
    stays coherent (mirrors test_timing_recovery_saturation_drop_oldest)."""
    import jax.numpy as jnp

    blk = sync.timing_recovery_block("GARDNER", 8, segments=2,
                                     warmup_symbols=4)
    st = blk.init()
    ramp = np.linspace(0, 1, 64, dtype=np.float32)
    for _ in range(8):
        st, _ = blk.apply(st, CF(jnp.asarray(ramp),
                                 jnp.zeros(64, jnp.float32)))
        buf, occ, _ = st
        assert 0 <= int(occ) <= buf.re.shape[0]
    sps = 8
    bits = np.resize([1.0, -1.0], 64)
    sig = np.repeat(bits, sps).astype(np.float32)
    got = 0
    for _ in range(8):
        st, out = blk.apply(st, CF(jnp.asarray(sig[:64]),
                                   jnp.zeros(64, jnp.float32)))
        got += int(np.asarray(out.count))
    assert got > 0


def test_segmented_degenerate_span_falls_back_to_serial():
    """Chunks too small to give each segment >= warmup_symbols symbols
    must take the serial path (identical output): ~1-symbol spans are
    warmup-dominated and their seams can duplicate/skip symbols (r4
    review finding — reproduced with segs=8, chunk=64, decim=8 before
    the guard)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, 64) * 2.0 - 1.0
    sig = np.repeat(bits, 8).astype(np.float32)

    def run(segments):
        blk = sync.timing_recovery_block("GARDNER", 8, segments=segments,
                                         output="indexes")
        st = blk.init()
        idxs = []
        for c in range(8):
            st, out = blk.apply(st, CF(jnp.asarray(sig[c * 64:(c + 1) * 64]),
                                       jnp.zeros(64, jnp.float32)))
            m = int(np.asarray(out.count))
            idxs.append(np.asarray(out.data)[:m])
        return np.concatenate(idxs)

    np.testing.assert_array_equal(run(8), run(1))
