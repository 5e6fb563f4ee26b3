"""Golden tests: digital modem chain vs reference (byte blocks bit-exact,
float loops sample-for-sample)."""

import numpy as np
import pytest

import jax.numpy as jnp

from csdr_tpu.core import cplx
from csdr_tpu.ops import digital, sync
from tests.util import refbind, assert_snr, cplx_noise, to_dev, to_host


def test_varicode_encoder_bit_exact():
    text = np.frombuffer(b"Hello, World! 123 \n~", np.uint8)
    ref, _ = refbind.psk31_varicode_encode(text)
    ours = digital.psk31_varicode_encoder_u8_u8(text)
    np.testing.assert_array_equal(ref, ours)


def test_varicode_decoder_roundtrip_and_reference():
    text = np.frombuffer(b"the quick brown fox 0123456789", np.uint8)
    bits = digital.psk31_varicode_encoder_u8_u8(text)
    # preamble zeros so the first character has its 00 context
    bits = np.concatenate([np.zeros(4, np.uint8), bits])
    ref = refbind.psk31_varicode_decode(bits)
    out = digital.psk31_varicode_decoder_u8_u8(bits)
    ours = np.asarray(out.data)[: int(out.count)]
    np.testing.assert_array_equal(ref, ours)
    assert bytes(ours.tobytes()) == b"the quick brown fox 0123456789"


def test_differential_codec_bit_exact():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 256).astype(np.uint8)
    for enc in (0, 1):
        ref, st_ref = refbind.differential_codec(bits, enc)
        if enc:
            ours, st = digital.differential_codec_encode(bits)
        else:
            ours, st = digital.differential_codec_decode(bits)
        np.testing.assert_array_equal(ref, np.asarray(ours))
        assert int(st) == st_ref


def test_psk31_interpolate_sine_matches_reference():
    x = cplx_noise(64, seed=1)
    ref = refbind.psk31_interpolate_sine_cc(x, 8)
    ours, _ = digital.psk31_interpolate_sine_cc(to_dev(x), 8)
    assert_snr(ref, to_host(ours), 100, "psk31 interp")


def test_pack_bits_roundtrip():
    rng = np.random.default_rng(2)
    b = rng.integers(0, 256, 64).astype(np.uint8)
    bits = digital.pack_bits_1to8_u8_u8(b)
    # 1to8 is LSB-first; 8to1 is MSB-first (both per reference) — roundtrip
    # needs a bit reversal per byte, like the reference's own chains do.
    rebits = np.asarray(bits).reshape(-1, 8)[:, ::-1].reshape(-1)
    back = digital.pack_bits_8to1_u8_u8(rebits)
    np.testing.assert_array_equal(b, np.asarray(back))


def test_dbpsk_roundtrip():
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, 128).astype(np.uint8)
    # DBPSK encode: differential encode then BPSK modulate
    enc, _ = digital.differential_codec_encode(bits)
    symbols = digital.psk_modulator_u8_c(np.asarray(enc), 2)
    dec, _ = digital.dbpsk_decoder_c_u8(symbols)
    # dbpsk output: 1 if no phase change; matches input bits (encode toggles
    # on 0); first output depends on initial state -> skip it
    np.testing.assert_array_equal(np.asarray(dec)[1:], bits[1:])


def test_costas_loop_matches_reference():
    # BPSK-ish signal with small carrier offset
    rng = np.random.default_rng(4)
    bits = rng.integers(0, 2, 64)
    bb = np.repeat(bits * 2.0 - 1.0, 32)
    n = len(bb)
    x = (bb * np.exp(1j * (2 * np.pi * 0.001 * np.arange(n) + 0.3))).astype(np.complex64)
    ref, (a, b, dmax) = refbind.bpsk_costas_loop(x, bandwidth=0.01)
    alpha, beta, dmax2 = sync.costas_loop_params(0.01)
    assert abs(alpha - a) < 1e-6 and abs(beta - b) < 1e-6 and abs(dmax2 - dmax) < 1e-6
    ours, err, dph, _ = sync.bpsk_costas_loop_cc(to_dev(x), alpha, beta, dmax2)
    ours = to_host(ours)
    # per-sample float noise is amplified chaotically through the feedback
    # loop; measured: the REFERENCE itself diverges from the float64 ideal at
    # the same rate as we do (both ~33 dB @2048), so the bounds reflect that
    assert_snr(ref[:256], ours[:256], 32, "costas early")
    assert_snr(ref, ours, 28, "costas full")

    # float64 model of the same recurrence (reference libcsdr.c:2108-2142)
    ph = fr = dp = 0.0
    model = np.zeros(len(x), np.complex128)
    for i, xi in enumerate(x.astype(np.complex128)):
        nco = np.cos(ph) + 1j * np.sin(ph)
        y = xi * nco
        model[i] = y
        e = np.pi * y.real * y.imag
        fr += e * beta
        dp = np.clip(e * alpha + fr, -dmax2, dmax2)
        ph = (ph + dp) % (2 * np.pi)
        if ph <= 0:
            ph += 2 * np.pi
    assert_snr(model[:128], ours[:128], 39, "costas vs f64 model (early)")
    assert_snr(model, ours, 30, "costas vs f64 model (full)")


@pytest.mark.parametrize("alg", ["GARDNER", "EARLYLATE"])
def test_timing_recovery_matches_reference(alg):
    rng = np.random.default_rng(5)
    decim = 32
    bits = rng.integers(0, 2, 64) * 2.0 - 1.0
    bb = np.repeat(bits, decim)
    # smooth it so the TED has slopes to work with
    k = np.hanning(decim)
    sm = np.convolve(bb, k / k.sum(), mode="same")
    x = (sm + 1j * 0.1 * sm).astype(np.complex64)
    ref_sym, ref_err, ref_idx, in_proc, last_corr = refbind.timing_recovery(
        x, alg, decim)
    blk = sync.timing_recovery_block(alg, decim)
    st, out = blk.apply(blk.init(), to_dev(x))
    ours = to_host(out.data)[: int(out.count)]
    assert len(ours) == len(ref_sym), (len(ours), len(ref_sym))
    assert_snr(ref_sym, ours, 60, f"timing recovery {alg}")
    # consumed-sample bookkeeping must match for streaming equivalence
    _buf, occ, corr = st
    assert int(corr) == last_corr
    assert len(x) - int(occ) == in_proc


def test_binary_slicer():
    x = np.asarray([-1.0, 0.5, 0.0, 2.0], np.float32)
    np.testing.assert_array_equal(np.asarray(digital.binary_slicer_f_u8(x)),
                                  [0, 1, 0, 1])


def test_timing_recovery_saturation_drop_oldest():
    """Adversarial input railing the Gardner error: the scan consumes less
    than arrives, so the carry must drop OLDEST (never clamp-overwrite) and
    stay coherent; pre-fix the write start clamped from chunk 3 on."""
    from csdr_tpu.core.cplx import CF
    from csdr_tpu.ops import sync

    blk = sync.timing_recovery_block("GARDNER", decimation=8)
    st = blk.init()
    ramp = np.linspace(0, 1, 64, dtype=np.float32)   # rising ramp rails +err
    for i in range(12):
        st, out = blk.apply(st, CF(jnp.asarray(ramp), jnp.zeros(64, jnp.float32)))
        buf, occ, corr = st
        assert int(occ) <= buf.re.shape[0], "carry overflow"
        assert int(occ) >= 0
    # recovery: a normal BPSK stream after the garbage still demodulates
    # (state machine did not wedge)
    sps = 8
    bits = np.resize([1.0, -1.0], 64)
    sig = np.repeat(bits, sps).astype(np.float32)
    for i in range(8):                      # same 64-sample chunking
        st, out = blk.apply(st, CF(jnp.asarray(sig[i * 64:(i + 1) * 64]),
                                   jnp.zeros(64, jnp.float32)))
    assert int(out.count) > 0


def test_pll_costas_reference_defaults():
    """Loop-parameter defaults mirror the reference CLI: pll PI ko=10,
    kd=0.1 (csdr.c:2546) and costas bandwidth=0.01 (the 2*pi is applied
    INSIDE, libcsdr.c:2098)."""
    from csdr_tpu.ops import sync

    alpha, beta = sync.pll_loop_params(0.01)
    bw = 2 * np.pi * 0.01
    assert abs(alpha - (0.707 * 2 * bw) / (10.0 * 0.1)) < 1e-9
    assert abs(beta - bw * bw / (10.0 * 0.1)) < 1e-12
    a2, b2, dmax = sync.costas_loop_params()
    assert abs(dmax - 2 * np.pi * 0.01) < 1e-9


@pytest.mark.parametrize("alg", ["GARDNER", "EARLYLATE"])
def test_timing_recovery_rowslice_pick_identical(alg, monkeypatch):
    """CSDR_TED_ROWSLICE=1 (row-window pick: sublane dynamic_slice +
    one-hot lane contraction) must be bit-identical to the default gather
    pick across chunked streaming (ops/sync.py, r4)."""
    from csdr_tpu.core.cplx import CF
    rng = np.random.default_rng(9)
    decim = 32
    bits = rng.integers(0, 2, 128) * 2.0 - 1.0
    sm = np.convolve(np.repeat(bits, decim), np.hanning(decim), mode="same")
    x = (sm + 1j * 0.2 * sm).astype(np.complex64)

    def run(env):
        monkeypatch.setenv("CSDR_TED_ROWSLICE", env)
        blk = sync.timing_recovery_block(alg, decim, use_q=True)
        st = blk.init()
        outs, counts = [], 0
        for c in range(4):
            st, out = blk.apply(st, to_dev(x[c * 1024:(c + 1) * 1024]))
            m = int(out.count)
            outs.append(to_host(out.data)[:m])
            counts += m
        return np.concatenate(outs), int(st[1]), int(st[2])

    y0, occ0, corr0 = run("0")
    y1, occ1, corr1 = run("1")
    assert (occ0, corr0) == (occ1, corr1)
    np.testing.assert_array_equal(y0, y1)
