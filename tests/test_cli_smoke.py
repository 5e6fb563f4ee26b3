"""Smoke sweep: EVERY registered CLI command runs on canned input without
crashing and (where it's a stream transform) produces output.  Catches
dispatch-level regressions that focused tests miss."""

import os
import subprocess
import sys

import numpy as np
import pytest

from csdr_tpu import cli

N = 4096
RNG = np.random.default_rng(0)
F32 = (0.3 * RNG.standard_normal(N)).astype(np.float32).tobytes()
CF64 = np.stack([0.3 * RNG.standard_normal(N), 0.3 * RNG.standard_normal(N)],
                -1).astype(np.float32).tobytes()
U8 = (RNG.integers(0, 2, N)).astype(np.uint8).tobytes()
S16 = (RNG.integers(-1000, 1000, N)).astype(np.int16).tobytes()

# command -> (args, input bytes, expect_stdout)
CASES = {
    "convert_u8_f": ([], bytes(range(256)) * 16, True),
    "convert_f_u8": ([], F32, True),
    "convert_s8_f": ([], U8, True),
    "convert_f_s8": ([], F32, True),
    "convert_s16_f": ([], S16, True),
    "convert_f_s16": ([], F32, True),
    "convert_s24_f": ([], U8 * 3, True),
    "convert_f_s24": ([], F32, True),
    "convert_f_samplerf": (["100"], F32, True),
    "realpart_cf": ([], CF64, True),
    "mono2stereo_s16": ([], S16, True),
    "stereo2mono_s16": ([], S16, True),
    "clone": ([], U8, True),
    "setbuf": (["1024"], U8, True),
    "through": ([], F32, True),
    "dump_f": ([], F32[:64], True),
    "dump_u8": ([], U8[:64], True),
    "yes_f": (["1.0", "64"], b"", True),
    "tee": (["/dev/null"], U8, True),
    "fifo": (["256", "16"], U8, True),
    "flowcontrol": (["1000000", "100"], U8[:2048], True),
    "none": ([], b"", False),
    "gain_ff": (["2.0"], F32, True),
    "limit_ff": ([], F32, True),
    "clipdetect_ff": ([], F32, True),
    "detect_nan_ff": ([], F32, True),
    "dcblock_ff": ([], F32, True),
    "fastdcblock_ff": ([], F32, True),
    "add_n_zero_samples_at_beginning_f": (["16"], F32, True),
    "add_const_cc": (["0.1", "0.2"], CF64, True),
    "shift_math_cc": (["0.1"], CF64, True),
    "shift_addition_cc": (["0.1"], CF64, True),
    "shift_table_cc": (["0.1", "1024"], CF64, True),
    "shift_addfast_cc": (["0.1"], CF64, True),
    "shift_unroll_cc": (["0.1"], CF64, True),
    "shift_addition_fc": (["0.1"], F32, True),
    "shift_addition_cc_test": ([], b"", False),
    "decimating_shift_addition_cc": (["0.1", "4"], CF64, True),
    "fir_decimate_cc": (["4", "0.05", "HAMMING"], CF64, True),
    "fir_interpolate_cc": (["4", "0.05", "HAMMING"], CF64, True),
    "plain_interpolate_cc": (["4"], CF64, True),
    "rational_resampler_ff": (["5", "2"], F32, True),
    "suboptimal_rational_resampler_ff": (["5", "2"], F32, True),
    "fractional_decimator_ff": (["2.5"], F32, True),
    "old_fractional_decimator_ff": (["2.5"], F32, True),
    "bandpass_fir_fft_cc": (["0.0", "0.2", "0.05"], CF64 * 4, True),
    "peaks_fir_cc": (["33", "0.1"], CF64, True),
    "pulse_shaping_filter_cc": (["RRC", "8", "33", "0.25"], CF64, True),
    "firdes_lowpass_f": (["0.1", "21"], b"", True),
    "firdes_bandpass_c": (["-0.1", "0.1", "21"], b"", True),
    "firdes_peak_c": (["0.1", "21"], b"", True),
    "firdes_pulse_shaping_filter_f": (["RRC", "8", "33", "0.25"], b"", True),
    "fmdemod_atan_cf": ([], CF64, True),
    "fmdemod_quadri_cf": ([], CF64, True),
    "amdemod_cf": ([], CF64, True),
    "amdemod_estimator_cf": ([], CF64, True),
    "deemphasis_wfm_ff": (["48000", "50e-6"], F32, True),
    "deemphasis_nfm_ff": (["8000"], F32, True),
    "fmmod_fc": ([], F32, True),
    "dsb_fc": (["0.0"], F32, True),
    "add_dcoffset_cc": ([], CF64, True),
    "fixed_amplitude_cc": (["0.5"], CF64, True),
    "agc_ff": ([], F32, True),
    "fastagc_ff": ([], F32 * 4, True),
    "simple_agc_cc": (["0.01"], CF64, True),
    "squelch_and_smeter_cc": (["1", "1"], CF64, True),
    "fft_cc": (["256", "256"], CF64, True),
    "fft_fc": (["256", "256"], F32, True),
    "logpower_cf": (["0"], CF64, True),
    "logaveragepower_cf": (["0", "256", "2"], CF64, True),
    "fft_exchange_sides_ff": (["256"], F32, True),
    "fft_one_side_ff": (["256"], F32, True),
    "compress_fft_adpcm_f_u8": (["256"], F32, True),
    "encode_ima_adpcm_i16_u8": ([], S16, True),
    "decode_ima_adpcm_u8_i16": ([], U8, True),
    "psk31_varicode_encoder_u8_u8": ([], b"HELLO", True),
    "psk31_varicode_decoder_u8_u8": ([], U8, False),
    "differential_encoder_u8_u8": ([], U8, True),
    "differential_decoder_u8_u8": ([], U8, True),
    "psk_modulator_u8_c": (["2"], U8, True),
    "psk31_interpolate_sine_cc": (["8"], CF64, True),
    "duplicate_samples_ntimes_u8_u8": (["1", "4"], U8, True),
    "pack_bits_1to8_u8_u8": ([], U8, True),
    "pack_bits_8to1_u8_u8": ([], U8, True),
    "invert_u8_u8": ([], U8, True),
    "binary_slicer_f_u8": ([], F32, True),
    "generic_slicer_f_u8": (["4"], F32, True),
    "dbpsk_decoder_c_u8": ([], CF64, True),
    "bfsk_demod_cf": (["0.2", "33"], CF64, True),
    "timing_recovery_cc": (["GARDNER", "8"], CF64, True),
    "bpsk_costas_loop_cc": (["0.01"], CF64, True),
    "pll_cc": (["2", "0.01"], CF64, True),
    "normalized_timing_variance_u32_f": (
        ["8", "0"], np.arange(0, 512, 8, dtype=np.uint32).tobytes(), False),
    "serial_line_decoder_f_u8": (["8"], F32, False),
    "pattern_search_u8_u8": (["4", "1", "0", "1"], U8, False),
    "syncword_search": (["af", "8"], U8, False),
    "awgn_cc": (["10"], CF64, True),
    "octave_complex_c": (["16", "32"], CF64, True),
    "_fft2octave": (["256"], CF64, True),
    "rtty_line_decoder_u8_u8": ([], U8, False),
    "rtty_baudot2ascii_u8_u8": ([], U8, False),
    "fastddc_fwd_cc": (["4"], CF64 * 2, True),
    "--help": ([], b"", False),
}
# sources / special cases exercised elsewhere or interactive-only
SKIP = {
    "REM", "floatdump_f", "convert_i16_f", "convert_f_i16",
    "mono2stereo_i16", "stereo2mono_i16", "fmdemod_quadri_novect_cf",
    "encode_ima_adpcm_s16_u8", "decode_ima_adpcm_u8_s16",  # aliases
    "uniform_noise_f", "gaussian_noise_c", "repeat_u8",      # infinite sources
    "fastddc_inv_cc",                                        # needs fwd stream
    "fft_benchmark",                                         # long-running
}


def _registry_names():
    return sorted(n for n in cli.REGISTRY if not n.startswith("-"))


def test_case_table_covers_registry():
    missing = [n for n in _registry_names()
               if n not in CASES and n not in SKIP]
    assert not missing, f"no smoke case for: {missing}"


@pytest.mark.parametrize("name", sorted(CASES))
def test_cli_smoke(name):
    args, inp, expect_out = CASES[name]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-m", "csdr_tpu.cli", name] + args,
                       input=inp, capture_output=True, timeout=300, env=env)
    assert r.returncode == 0, (name, r.returncode, r.stderr.decode()[-400:])
    if expect_out:
        assert len(r.stdout) > 0, (name, r.stderr.decode()[-200:])
