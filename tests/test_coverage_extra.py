"""Golden/behavior tests for the long-tail ops that had no coverage:
fmmod, amdemod_estimator, deemphasis_nfm, apply_fir (peaks/pulse-shaping
core), RRC/cosine tap design, squelch, fastagc, dsb, samplerf, fft_one_side,
add_n_zero, bfsk, serial line decoder, normalized timing variance."""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "ref"))
import refbind  # noqa: E402

from csdr_tpu import firdes
from csdr_tpu.core import cplx
from csdr_tpu.core.cplx import CF
from csdr_tpu.ops import agc, demod, digital, fir, mod, noise, spectrum, util_ops


def _cf(x):
    x = np.asarray(x, np.complex64)
    return CF(jnp.asarray(x.real), jnp.asarray(x.imag))


def _host(x: CF):
    return np.asarray(x.re) + 1j * np.asarray(x.im)


RNG = np.random.default_rng(11)
X = (RNG.standard_normal(4096) + 1j * RNG.standard_normal(4096)).astype(np.complex64)
F = RNG.standard_normal(4096).astype(np.float32) * 0.5


def test_fmmod_fc_golden():
    ref, ref_ph = refbind.fmmod_fc(F)
    y, ph = mod.fmmod_fc(jnp.asarray(F))
    np.testing.assert_allclose(_host(y), ref, atol=2e-5)
    assert abs(float(ph) - ref_ph) < 1e-4


def test_fmmod_streaming_phase_carry():
    y1, ph = mod.fmmod_fc(jnp.asarray(F[:2048]))
    y2, _ = mod.fmmod_fc(jnp.asarray(F[2048:]), ph)
    once, _ = mod.fmmod_fc(jnp.asarray(F))
    np.testing.assert_allclose(_host(y2), _host(once)[2048:], atol=2e-4)


def test_amdemod_estimator_golden():
    ref = refbind.amdemod_estimator_cf(X)
    ours = demod.amdemod_estimator_cf(_cf(X))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-6)


@pytest.mark.parametrize("rate", [48000, 44100, 11025, 8000])
def test_deemphasis_nfm_response(rate):
    """Our taps are REGENERATED from the reference's documented octave
    recipe (predefined.h:41-55), not copied, so the test checks the
    specified response: reject <200 Hz, pass 500 Hz, ~-20 dB/decade by
    3.5 kHz (firdes.deemphasis_nfm_taps docstring)."""
    def gain(freq):
        n = 1 << 14
        tone = np.sin(2 * np.pi * freq * np.arange(n) / rate).astype(np.float32)
        y = np.asarray(demod.deemphasis_nfm_ff(jnp.asarray(tone), rate))
        return np.sqrt(np.mean(y[500:] ** 2)) * np.sqrt(2)
    # the recipe's normalize_at_freq is phase-sensitive, so absolute gain
    # is arbitrary per rate — assert the response SHAPE only
    g500 = gain(500)
    assert gain(100) < 0.2 * g500           # reject below 200 Hz
    hi = 3500 if rate > 16000 else 3000
    assert gain(hi) < 0.5 * g500            # de-emphasis rolloff
    assert gain(1000) > 0.5 * g500          # passband


def test_apply_fir_cc_golden():
    taps = firdes.firdes_add_peak_c(57, [0.1, -0.2])
    ref = refbind.apply_fir_cc(X, taps)
    ours = _host(fir.apply_fir_cc(_cf(X), _cf(taps)))
    m = min(len(ref), len(ours))
    np.testing.assert_allclose(ours[:m], ref[:m], atol=2e-5)


def test_rrc_cosine_taps_golden():
    np.testing.assert_allclose(np.asarray(firdes.firdes_rrc_f(121, 32, 0.25)),
                               refbind.firdes_rrc_f(121, 32, 0.25), atol=2e-6)
    np.testing.assert_allclose(np.asarray(firdes.firdes_cosine_f(65, 32)),
                               refbind.firdes_cosine_f(65, 32), atol=2e-6)


def test_squelch_gate():
    loud = _cf(X)
    quiet = _cf(X * 1e-4)
    y, p = util_ops.squelch_and_smeter_cc(loud, 0.01)
    assert float(p) > 0.01 and np.abs(_host(y)).max() > 0
    y2, p2 = util_ops.squelch_and_smeter_cc(quiet, 0.01)
    assert float(p2) < 0.01 and not np.abs(_host(y2)).any()
    # level 0 = squelch off
    y3, _ = util_ops.squelch_and_smeter_cc(quiet, 0.0)
    assert np.abs(_host(y3)).any()


def test_fastagc_normalizes():
    n = 1024
    sig = (0.05 * np.sin(2 * np.pi * 0.01 * np.arange(4 * n))).astype(np.float32)
    state = agc.fastagc_init(n) if hasattr(agc, "fastagc_init") else None
    blk = agc.fastagc_block(reference=1.0, block_size=n)
    st = blk.init()
    outs = []
    for i in range(4):
        st, y = blk.apply(st, jnp.asarray(sig[i * n:(i + 1) * n]))
        outs.append(np.asarray(y))
    # after the 2-block latency, output peak ~= reference
    peak = np.abs(np.concatenate(outs[2:])).max()
    assert 0.8 < peak < 1.2, peak


def test_dsb_and_samplerf():
    y = mod.dsb_fc(jnp.asarray(F), 0.25)
    assert np.allclose(np.asarray(y.re), F) and np.allclose(np.asarray(y.im), 0.25)
    rf = mod.convert_f_samplerf(jnp.asarray(F[:16]), 100)
    assert np.asarray(rf).nbytes > 0


def test_fft_one_side_and_exchange():
    v = np.arange(16, dtype=np.float32)
    half = np.asarray(spectrum.fft_one_side_ff(jnp.asarray(v)))
    assert len(half) == 8 and (half == v[:8]).all()
    sw = np.asarray(spectrum.fft_exchange_sides_ff(jnp.asarray(v)))
    assert (sw == np.concatenate([v[8:], v[:8]])).all()


def test_add_n_zero_samples():
    y = np.asarray(noise.add_n_zero_samples_at_beginning_f(jnp.asarray(F[:8]), 4))
    assert (y[:4] == 0).all() and np.allclose(y[4:], F[:8])


def test_bfsk_demod_sign():
    # mark tone -> positive, space tone -> negative
    length = 65
    mark_r, space_r = 0.1, -0.1
    mark = _cf(np.asarray(firdes.firdes_add_peak_c(length, [mark_r])))
    space = _cf(np.asarray(firdes.firdes_add_peak_c(length, [space_r])))
    n = 2048
    tone_m = _cf(np.exp(2j * np.pi * mark_r * np.arange(n)))
    tone_s = _cf(np.exp(2j * np.pi * space_r * np.arange(n)))
    ym = np.asarray(digital.bfsk_demod_cf(tone_m, mark, space))
    ys = np.asarray(digital.bfsk_demod_cf(tone_s, mark, space))
    assert ym[length:].mean() > 0 > ys[length:].mean()


def test_serial_line_decoder_roundtrip():
    # software UART: frame bytes at 8 samples/bit, 8N1
    sps = 8.0
    payload = np.frombuffer(b"HELLO UART", np.uint8)
    # reference framing (libcsdr.c:1656-1729): idle HIGH, start bit LOW
    # (high->low edge), data MSB-first (+1/-1), stop bit HIGH
    wave = [np.full(40, 1.0, np.float32)]
    for byte in payload:
        bits = [0] + [(int(byte) >> (7 - i)) & 1 for i in range(8)] + [1]
        for b in bits:
            wave.append(np.full(int(sps), 1.0 if b else -1.0, np.float32))
        wave.append(np.full(int(sps), 1.0, np.float32))   # inter-frame idle
    wave.append(np.full(64, 1.0, np.float32))
    sig = np.concatenate(wave)
    out, used = digital.serial_line_decoder_f_u8(sig, sps)
    got = bytes(int(v) & 0xFF for v in np.asarray(out))
    assert got == bytes(payload), got


def test_normalized_timing_variance_zero_for_perfect():
    sps = 64
    idx = (np.arange(50) * sps + 7).astype(np.uint32)
    v = digital.normalized_timing_variance_u32_f(idx, sps, 7)
    assert float(np.asarray(v)) < 1e-6
