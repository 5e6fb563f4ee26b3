"""Bit-exact ADPCM golden tests + spectrum path checks."""

import numpy as np

from csdr_tpu.core import cplx
from csdr_tpu.ops import adpcm, spectrum
from tests.util import refbind, assert_snr, cplx_noise, to_dev, to_host


def test_adpcm_encode_bit_exact():
    rng = np.random.default_rng(0)
    s = (np.cumsum(rng.standard_normal(4096)) * 500).astype(np.int16)
    ref, ref_st = refbind.encode_ima_adpcm(s)
    ours, st = adpcm.encode_ima_adpcm(s)
    np.testing.assert_array_equal(ref, np.asarray(ours))
    assert (int(st[0]), int(st[1])) == ref_st


def test_adpcm_decode_bit_exact():
    rng = np.random.default_rng(1)
    p = rng.integers(0, 256, 2048).astype(np.uint8)
    ref, ref_st = refbind.decode_ima_adpcm(p)
    ours, st = adpcm.decode_ima_adpcm(p)
    np.testing.assert_array_equal(ref, np.asarray(ours))
    assert (int(st[0]), int(st[1])) == ref_st


def test_adpcm_roundtrip_tracks_signal():
    t = np.arange(8192)
    s = (8000 * np.sin(2 * np.pi * t / 200)).astype(np.int16)
    packed, _ = adpcm.encode_ima_adpcm(s)
    back, _ = adpcm.decode_ima_adpcm(np.asarray(packed))
    err = np.asarray(back[100:], np.float64) - np.asarray(s[100:], np.float64)
    assert np.sqrt((err ** 2).mean()) < 500  # ~ -24 dB codec noise

def test_fft_cc_overlapped_framing():
    from csdr_tpu import firdes
    n_fft, every = 512, 256
    blk = spectrum.fft_cc_block(n_fft, every)
    x = cplx_noise(2048, seed=2)
    st = blk.init()
    st, sp = blk.apply(st, to_dev(x))
    sp = to_host(sp)
    assert sp.shape == (8, n_fft)
    # frame b covers x[b*every - (n_fft-every) : ...], zero history at start
    w = firdes.precalculate_window(n_fft).astype(np.float64)
    xp = np.concatenate([np.zeros(n_fft - every, np.complex64), x])
    for b in (0, 3, 7):
        frame = xp[b * every: b * every + n_fft] * w
        ref = np.fft.fft(frame)
        assert_snr(ref, sp[b], 100, f"fft_cc frame {b}")


def test_logaveragepower():
    x = cplx_noise(4 * 256, seed=3).reshape(4, 256)
    sp = cplx.from_numpy(x)
    out = np.asarray(spectrum.logaveragepower_cf(sp, add_db=5.0, avgnumber=2))
    ref = 10 * np.log10((np.abs(x) ** 2).reshape(2, 2, 256).sum(1)) + 5.0 - 10 * np.log10(2)
    np.testing.assert_allclose(out, ref, rtol=2e-3)  # f32 log10


def test_compress_fft_adpcm_matches_reference():
    rng = np.random.default_rng(4)
    row = (rng.standard_normal(246) * 10 - 60).astype(np.float32)
    ours = np.asarray(adpcm.compress_fft_adpcm_f_u8(row, 246))
    padded = np.concatenate([np.full(10, row[0], np.float32), row])
    s16 = (padded * 100).astype(np.int16)
    ref, _ = refbind.encode_ima_adpcm(s16)
    np.testing.assert_array_equal(ref, ours)
