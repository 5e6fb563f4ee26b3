"""ctypes bindings to the REFERENCE libcsdr, built on demand for golden tests.

The reference sources are compiled *in place from /root/reference* (read-only)
into a gitignored build dir inside this repo; no reference code is copied.
FFT support comes from the local fftw3f-API shim (fftw_shim.c).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

REF = Path("/root/reference")
HERE = Path(__file__).resolve().parent
BUILD = HERE.parent.parent / ".ref_build"
LIB = BUILD / "libcsdr_ref.so"


def build() -> Path:
    BUILD.mkdir(exist_ok=True)
    # single-TU wrapper (the reference's own build style, Makefile:51-57)
    srcs = [REF / "libcsdr_wrapper.c", REF / "fft_fftw.c", HERE / "fftw_shim.c"]
    newest_src = max(s.stat().st_mtime for s in srcs)
    if LIB.exists() and LIB.stat().st_mtime > newest_src:
        return LIB
    cmd = ["gcc", "-O2", "-fPIC", "-shared", "-std=gnu99", "-include", "stdio.h",
           "-o", str(LIB), *map(str, srcs),
           "-I", str(HERE), "-I", str(REF),
           "-DUSE_FFTW", "-DLIBCSDR_GPL", "-DUSE_IMA_ADPCM", "-lm"]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return LIB


_lib = None


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(str(build()))
    return _lib


f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
i16p = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")


def as_cf(x: np.ndarray) -> np.ndarray:
    """complex64 -> interleaved float32 view for complexf* args."""
    return np.ascontiguousarray(x).view(np.float32)


WINDOW_BOXCAR, WINDOW_BLACKMAN, WINDOW_HAMMING = 0, 1, 2  # libcsdr.h:70-73


def firdes_lowpass_f(length: int, cutoff: float, window: int = WINDOW_HAMMING) -> np.ndarray:
    out = np.zeros(length, np.float32)
    l_ = lib()
    l_.firdes_lowpass_f.argtypes = [f32p, ctypes.c_int, ctypes.c_float, ctypes.c_int]
    l_.firdes_lowpass_f(out, length, cutoff, window)
    return out


def firdes_bandpass_c(length: int, lowcut: float, highcut: float, window: int = WINDOW_HAMMING) -> np.ndarray:
    out = np.zeros(2 * length, np.float32)
    l_ = lib()
    l_.firdes_bandpass_c.argtypes = [f32p, ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_int]
    l_.firdes_bandpass_c(out, length, lowcut, highcut, window)
    return out.view(np.complex64)


def fir_decimate_cc(x: np.ndarray, taps: np.ndarray, decimation: int) -> np.ndarray:
    l_ = lib()
    xi = as_cf(x)
    out = np.zeros_like(xi)
    l_.fir_decimate_cc.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int]
    l_.fir_decimate_cc.restype = ctypes.c_int
    n = l_.fir_decimate_cc(xi, out, len(x), decimation, np.ascontiguousarray(taps, np.float32), len(taps))
    return out.view(np.complex64)[:n]


def fir_interpolate_cc(x: np.ndarray, taps: np.ndarray, interpolation: int) -> np.ndarray:
    l_ = lib()
    xi = as_cf(x)
    out = np.zeros(2 * len(x) * interpolation + 16, np.float32)
    l_.fir_interpolate_cc.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int]
    l_.fir_interpolate_cc.restype = ctypes.c_int
    n = l_.fir_interpolate_cc(xi, out, len(x), interpolation,
                              np.ascontiguousarray(taps, np.float32), len(taps))
    return out.view(np.complex64)[:n]


def shift_math_cc(x: np.ndarray, rate: float, phase: float = 0.0):
    l_ = lib()
    xi = as_cf(x)
    out = np.zeros_like(xi)
    l_.shift_math_cc.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_float, ctypes.c_float]
    l_.shift_math_cc.restype = ctypes.c_float
    nph = l_.shift_math_cc(xi, out, len(x), rate, phase)
    return out.view(np.complex64), nph


def fmdemod_quadri_cf(x: np.ndarray, last=0.0 + 0.0j) -> np.ndarray:
    l_ = lib()

    class complexf(ctypes.Structure):
        _fields_ = [("i", ctypes.c_float), ("q", ctypes.c_float)]

    xi = as_cf(x)
    out = np.zeros(len(x), np.float32)
    temp = np.zeros(4 * len(x), np.float32)
    l_.fmdemod_quadri_cf.argtypes = [f32p, f32p, ctypes.c_int, f32p, complexf]
    l_.fmdemod_quadri_cf.restype = complexf
    l_.fmdemod_quadri_cf(xi, out, len(x), temp, complexf(last.real, last.imag))
    return out


def deemphasis_wfm_ff(x: np.ndarray, tau: float, rate: int, last: float = 0.0) -> np.ndarray:
    l_ = lib()
    out = np.zeros_like(x, dtype=np.float32)
    l_.deemphasis_wfm_ff.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_float, ctypes.c_int, ctypes.c_float]
    l_.deemphasis_wfm_ff.restype = ctypes.c_float
    l_.deemphasis_wfm_ff(np.ascontiguousarray(x, np.float32), out, len(x), tau, rate, last)
    return out


def agc_ff(x, reference=0.2, attack_rate=0.01, decay_rate=0.0001, max_gain=65536.0,
           hang_time=200, attack_wait_time=0, gain_filter_alpha=0.999, last_gain=1.0):
    """Defaults mirror the reference CLI's (csdr.c:2018-2044), same as
    csdr_tpu.ops.agc.agc_ff."""
    l_ = lib()
    out = np.zeros_like(x, dtype=np.float32)
    l_.agc_ff.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_float, ctypes.c_float,
                          ctypes.c_float, ctypes.c_float, ctypes.c_short, ctypes.c_short,
                          ctypes.c_float, ctypes.c_float]
    l_.agc_ff.restype = ctypes.c_float
    g = l_.agc_ff(np.ascontiguousarray(x, np.float32), out, len(x), reference,
                  attack_rate, decay_rate, max_gain, hang_time, attack_wait_time,
                  gain_filter_alpha, last_gain)
    return out, g


def rational_resampler_ff(x, taps, interpolation, decimation, last_taps_delay=0):
    l_ = lib()

    class rr_t(ctypes.Structure):
        _fields_ = [("input_processed", ctypes.c_int), ("output_size", ctypes.c_int),
                    ("last_taps_delay", ctypes.c_int)]

    out = np.zeros(len(x) * interpolation // decimation + 16, np.float32)
    l_.rational_resampler_ff.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_int,
                                         ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int]
    l_.rational_resampler_ff.restype = rr_t
    d = l_.rational_resampler_ff(np.ascontiguousarray(x, np.float32), out, len(x),
                                 interpolation, decimation,
                                 np.ascontiguousarray(taps, np.float32), len(taps),
                                 last_taps_delay)
    return out[:d.output_size], d.input_processed, d.last_taps_delay


class _frac_dec_t(ctypes.Structure):
    # reference libcsdr.h:151-169
    _fields_ = [("where", ctypes.c_float),
                ("input_processed", ctypes.c_int),
                ("output_size", ctypes.c_int),
                ("num_poly_points", ctypes.c_int),
                ("poly_precalc_denomiator", ctypes.POINTER(ctypes.c_float)),
                ("coeffs_buf", ctypes.POINTER(ctypes.c_float)),
                ("filtered_buf", ctypes.POINTER(ctypes.c_float)),
                ("xifirst", ctypes.c_int),
                ("xilast", ctypes.c_int),
                ("rate", ctypes.c_float),
                ("taps", ctypes.POINTER(ctypes.c_float)),
                ("taps_length", ctypes.c_int)]


def fractional_decimator_init(rate: float, num_poly_points: int = 12, taps=None):
    l_ = lib()
    l_.fractional_decimator_ff_init.argtypes = [ctypes.c_float, ctypes.c_int,
                                                ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    l_.fractional_decimator_ff_init.restype = _frac_dec_t
    if taps is None:
        d = l_.fractional_decimator_ff_init(rate, num_poly_points, None, 0)
        d._taps_keepalive = None
    else:
        t = np.ascontiguousarray(taps, np.float32)
        d = l_.fractional_decimator_ff_init(
            rate, num_poly_points, t.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(t))
        d._taps_keepalive = t
    return d


def fractional_decimator_ff(x, d):
    l_ = lib()
    out = np.zeros(len(x), np.float32)
    l_.fractional_decimator_ff.argtypes = [f32p, f32p, ctypes.c_int,
                                           ctypes.POINTER(_frac_dec_t)]
    l_.fractional_decimator_ff(np.ascontiguousarray(x, np.float32), out, len(x),
                               ctypes.byref(d))
    return out[:d.output_size], d.input_processed


def simple_agc_cc(x, rate, reference=1.0, max_gain=65535.0, gain=1.0):
    l_ = lib()
    xi = as_cf(x)
    out = np.zeros_like(xi)
    g = ctypes.c_float(gain)
    l_.simple_agc_cc.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_float,
                                 ctypes.c_float, ctypes.c_float,
                                 ctypes.POINTER(ctypes.c_float)]
    l_.simple_agc_cc(xi, out, len(x), rate, reference, max_gain, ctypes.byref(g))
    return out.view(np.complex64), g.value


def dcblock_ff(x, a=0.999, last_input=0.0, last_output=0.0):
    l_ = lib()

    class pres_t(ctypes.Structure):
        _fields_ = [("last_input", ctypes.c_float), ("last_output", ctypes.c_float)]

    out = np.zeros_like(x, dtype=np.float32)
    l_.dcblock_ff.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_float, pres_t]
    l_.dcblock_ff.restype = pres_t
    p = l_.dcblock_ff(np.ascontiguousarray(x, np.float32), out, len(x), a,
                      pres_t(last_input, last_output))
    return out, (p.last_input, p.last_output)


def fastdcblock_ff(x, last_dc=0.0):
    l_ = lib()
    out = np.zeros_like(x, dtype=np.float32)
    l_.fastdcblock_ff.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_float]
    l_.fastdcblock_ff.restype = ctypes.c_float
    avg = l_.fastdcblock_ff(np.ascontiguousarray(x, np.float32), out, len(x), last_dc)
    return out, avg


def fmdemod_atan_cf(x, last_phase=0.0):
    l_ = lib()
    xi = as_cf(x)
    out = np.zeros(len(x), np.float32)
    l_.fmdemod_atan_cf.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_float]
    l_.fmdemod_atan_cf.restype = ctypes.c_float
    ph = l_.fmdemod_atan_cf(xi, out, len(x), last_phase)
    return out, ph


def amdemod_cf(x):
    l_ = lib()
    xi = as_cf(x)
    out = np.zeros(len(x), np.float32)
    l_.amdemod_cf.argtypes = [f32p, f32p, ctypes.c_int]
    l_.amdemod_cf(xi, out, len(x))
    return out


# --- fastddc (reference fastddc.c + csdr.c:2255-2378 CLI wiring) -----------

class _sad_t(ctypes.Structure):
    _fields_ = [("sindelta", ctypes.c_float), ("cosdelta", ctypes.c_float),
                ("rate", ctypes.c_float)]


class _dsas_t(ctypes.Structure):
    _fields_ = [("decimation_remain", ctypes.c_int),
                ("starting_phase", ctypes.c_float),
                ("output_size", ctypes.c_int)]


class _fastddc_t(ctypes.Structure):
    _fields_ = [("pre_decimation", ctypes.c_int), ("post_decimation", ctypes.c_int),
                ("taps_length", ctypes.c_int), ("taps_min_length", ctypes.c_int),
                ("overlap_length", ctypes.c_int), ("fft_size", ctypes.c_int),
                ("fft_inv_size", ctypes.c_int), ("input_size", ctypes.c_int),
                ("post_input_size", ctypes.c_int), ("pre_shift", ctypes.c_float),
                ("startbin", ctypes.c_int), ("v", ctypes.c_int),
                ("offsetbin", ctypes.c_int), ("post_shift", ctypes.c_float),
                ("output_scrape", ctypes.c_int), ("scrap", ctypes.c_int),
                ("dsadata", _sad_t)]


def fastddc_init(transition_bw, decimation, shift_rate):
    l_ = lib()
    ddc = _fastddc_t()
    l_.fastddc_init.argtypes = [ctypes.POINTER(_fastddc_t), ctypes.c_float,
                                ctypes.c_int, ctypes.c_float]
    l_.fastddc_init.restype = ctypes.c_int
    err = l_.fastddc_init(ctypes.byref(ddc), transition_bw, decimation, shift_rate)
    assert not err
    return ddc


def _make_plan(size, inbuf, outbuf, forward):
    l_ = lib()
    l_.make_fft_c2c.argtypes = [ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
                                ctypes.c_int, ctypes.c_int]
    l_.make_fft_c2c.restype = ctypes.c_void_p
    return l_.make_fft_c2c(size, inbuf.ctypes.data, outbuf.ctypes.data,
                           1 if forward else 0, 0)


def fastddc_reference(x, decimation, shift_rate, transition_bw=0.05):
    """Simulate `csdr fastddc_fwd_cc D | csdr fastddc_inv_cc r D` streaming.
    Returns (channel_samples, ddc)."""
    l_ = lib()
    ddc = fastddc_init(transition_bw, decimation, shift_rate)
    fft, ins, ov = ddc.fft_size, ddc.input_size, ddc.overlap_length

    # taps fft (csdr.c:2345-2356)
    taps = np.zeros(fft, np.complex64)
    taps_fft = np.zeros(fft, np.complex64)
    half_bw = 0.5 / decimation
    tv = firdes_bandpass_c(ddc.taps_length, (-shift_rate) - half_bw,
                           (-shift_rate) + half_bw)
    taps[: ddc.taps_length] = tv
    plan_taps = _make_plan(fft, taps.view(np.float32), taps_fft.view(np.float32), True)
    l_.fft_execute.argtypes = [ctypes.c_void_p]
    l_.fft_execute(plan_taps)
    l_.fft_swap_sides.argtypes = [f32p, ctypes.c_int]
    l_.fft_swap_sides(taps_fft.view(np.float32), fft)

    # fwd: overlapped framing, zero history
    fwd_in = np.zeros(fft, np.complex64)
    fwd_out = np.zeros(fft, np.complex64)
    plan_fwd = _make_plan(fft, fwd_in.view(np.float32), fwd_out.view(np.float32), True)
    inv_in = np.zeros(ddc.fft_inv_size, np.complex64)
    inv_out = np.zeros(ddc.fft_inv_size, np.complex64)
    plan_inv = _make_plan(ddc.fft_inv_size, inv_in.view(np.float32),
                          inv_out.view(np.float32), False)

    l_.fastddc_inv_cc.argtypes = [f32p, f32p, ctypes.POINTER(_fastddc_t),
                                  ctypes.c_void_p, f32p, _dsas_t]
    l_.fastddc_inv_cc.restype = _dsas_t

    stat = _dsas_t(0, 0.0, 0)
    outs = []
    spectrum = np.zeros(fft, np.complex64)
    chan_out = np.zeros(ddc.post_input_size, np.complex64)
    nframes = len(x) // ins
    for fidx in range(nframes):
        fwd_in[:ov] = fwd_in[ins: ins + ov]
        fwd_in[ov:] = x[fidx * ins: (fidx + 1) * ins]
        l_.fft_execute(plan_fwd)
        spectrum[:] = fwd_out
        stat = l_.fastddc_inv_cc(spectrum.view(np.float32), chan_out.view(np.float32),
                                 ctypes.byref(ddc), plan_inv,
                                 taps_fft.view(np.float32), stat)
        outs.append(chan_out[: stat.output_size].copy())
    return np.concatenate(outs), ddc


def encode_ima_adpcm(samples, prev=0, index=0):
    l_ = lib()

    class ima_t(ctypes.Structure):
        _fields_ = [("index", ctypes.c_int), ("previousValue", ctypes.c_int)]

    s = np.ascontiguousarray(samples, np.int16)
    out = np.zeros(len(s) // 2, np.uint8)
    l_.encode_ima_adpcm_i16_u8.argtypes = [i16p, u8p, ctypes.c_int, ima_t]
    l_.encode_ima_adpcm_i16_u8.restype = ima_t
    st = l_.encode_ima_adpcm_i16_u8(s, out, len(s), ima_t(index, prev))
    return out, (st.previousValue, st.index)


def decode_ima_adpcm(packed, prev=0, index=0):
    l_ = lib()

    class ima_t(ctypes.Structure):
        _fields_ = [("index", ctypes.c_int), ("previousValue", ctypes.c_int)]

    p = np.ascontiguousarray(packed, np.uint8)
    out = np.zeros(len(p) * 2, np.int16)
    l_.decode_ima_adpcm_u8_i16.argtypes = [u8p, i16p, ctypes.c_int, ima_t]
    l_.decode_ima_adpcm_u8_i16.restype = ima_t
    st = l_.decode_ima_adpcm_u8_i16(p, out, len(p), ima_t(index, prev))
    return out, (st.previousValue, st.index)


# --- digital chain ---------------------------------------------------------

def psk31_varicode_encode(text):
    l_ = lib()
    t = np.ascontiguousarray(text, np.uint8)
    out = np.zeros(len(t) * 16 + 64, np.uint8)
    ip = ctypes.c_int(0)
    osz = ctypes.c_int(0)
    l_.psk31_varicode_encoder_u8_u8.argtypes = [u8p, u8p, ctypes.c_int, ctypes.c_int,
                                                ctypes.POINTER(ctypes.c_int),
                                                ctypes.POINTER(ctypes.c_int)]
    l_.psk31_varicode_encoder_u8_u8(t, out, len(t), len(out),
                                    ctypes.byref(ip), ctypes.byref(osz))
    return out[:osz.value], ip.value


def psk31_varicode_decode(bits):
    l_ = lib()
    l_.psk31_varicode_decoder_push.argtypes = [ctypes.POINTER(ctypes.c_ulonglong),
                                               ctypes.c_ubyte]
    l_.psk31_varicode_decoder_push.restype = ctypes.c_char
    shr = ctypes.c_ulonglong(0)
    out = []
    for b in np.asarray(bits, np.uint8):
        c = l_.psk31_varicode_decoder_push(ctypes.byref(shr), int(b))
        if c != b"\x00":
            out.append(c[0])
    return np.asarray(out, np.uint8)


def differential_codec(x, encode, state=0):
    l_ = lib()
    xi = np.ascontiguousarray(x, np.uint8)
    out = np.zeros_like(xi)
    l_.differential_codec.argtypes = [u8p, u8p, ctypes.c_int, ctypes.c_int,
                                      ctypes.c_ubyte]
    l_.differential_codec.restype = ctypes.c_ubyte
    st = l_.differential_codec(xi, out, len(xi), int(encode), state)
    return out, st


def psk31_interpolate_sine_cc(x, interpolation, last=0j):
    l_ = lib()

    class complexf(ctypes.Structure):
        _fields_ = [("i", ctypes.c_float), ("q", ctypes.c_float)]

    xi = as_cf(x)
    out = np.zeros(2 * len(x) * interpolation, np.float32)
    l_.psk31_interpolate_sine_cc.argtypes = [f32p, f32p, ctypes.c_int,
                                             ctypes.c_int, complexf]
    l_.psk31_interpolate_sine_cc.restype = complexf
    l_.psk31_interpolate_sine_cc(xi, out, len(x), interpolation,
                                 complexf(last.real, last.imag))
    return out.view(np.complex64)


class _costas_t(ctypes.Structure):
    # reference libcsdr.h:364-374
    _fields_ = [("alpha", ctypes.c_float), ("beta", ctypes.c_float),
                ("decision_directed", ctypes.c_int),
                ("current_freq", ctypes.c_float), ("dphase", ctypes.c_float),
                ("nco_phase", ctypes.c_float), ("dphase_max", ctypes.c_float),
                ("dphase_max_reset_to_zero", ctypes.c_int)]


def bpsk_costas_loop(x, bandwidth=2*np.pi/100, damping=0.707, decision_directed=False):
    l_ = lib()
    s = _costas_t()
    l_.init_bpsk_costas_loop_cc.argtypes = [ctypes.POINTER(_costas_t), ctypes.c_int,
                                            ctypes.c_float, ctypes.c_float]
    l_.init_bpsk_costas_loop_cc(ctypes.byref(s), int(decision_directed),
                                damping, bandwidth)
    xi = as_cf(x)
    out = np.zeros_like(xi)
    err = np.zeros(len(x), np.float32)
    l_.bpsk_costas_loop_cc.argtypes = [f32p, f32p, ctypes.c_int, f32p, f32p,
                                       ctypes.c_void_p, ctypes.POINTER(_costas_t)]
    l_.bpsk_costas_loop_cc(xi, out, len(x), err, err, None, ctypes.byref(s))
    return out.view(np.complex64), (s.alpha, s.beta, s.dphase_max)


class _timing_t(ctypes.Structure):
    # reference libcsdr.h:322-336
    _fields_ = [("algorithm", ctypes.c_int), ("decimation_rate", ctypes.c_int),
                ("output_size", ctypes.c_int), ("input_processed", ctypes.c_int),
                ("use_q", ctypes.c_int), ("debug_phase", ctypes.c_int),
                ("debug_every_nth", ctypes.c_int),
                ("debug_writefiles_path", ctypes.c_char_p),
                ("last_correction_offset", ctypes.c_int),
                ("earlylate_ratio", ctypes.c_float),
                ("loop_gain", ctypes.c_float), ("max_error", ctypes.c_float)]


def timing_recovery(x, algorithm, decimation, loop_gain=0.5, max_error=2.0,
                    use_q=False):
    """One-shot reference timing_recovery_cc over the whole array."""
    l_ = lib()
    ALG = {"GARDNER": 0, "EARLYLATE": 1}  # enum order in libcsdr.h
    st = _timing_t()
    l_.timing_recovery_init.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                        ctypes.c_float, ctypes.c_float,
                                        ctypes.c_int, ctypes.c_char_p]
    l_.timing_recovery_init.restype = _timing_t
    st = l_.timing_recovery_init(ALG[algorithm.upper()], decimation, int(use_q),
                                 loop_gain, max_error, -1, None)
    xi = as_cf(x)
    out = np.zeros_like(xi)
    errs = np.zeros(len(x), np.float32)
    idxs = np.zeros(len(x), np.int32)
    l_.timing_recovery_cc.argtypes = [f32p, f32p, ctypes.c_int, f32p,
                                      np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                                      ctypes.POINTER(_timing_t)]
    l_.timing_recovery_cc(xi, out, len(x), errs, idxs, ctypes.byref(st))
    n = st.output_size
    return (out.view(np.complex64)[:n], errs[:n], idxs[:n],
            st.input_processed, st.last_correction_offset)


def firdes_add_peak_c(length: int, rates, window: int = WINDOW_HAMMING,
                      normalize: bool = True) -> np.ndarray:
    """Multi-peak complex FIR design (libcsdr.c:2219-2259): additive over
    rates, optional normalize on the last call — mirrors peaks_fir_cc's CLI
    usage (csdr.c:2975-3016)."""
    out = np.zeros(2 * length, np.float32)
    l_ = lib()
    l_.firdes_add_peak_c.argtypes = [f32p, ctypes.c_int, ctypes.c_float,
                                     ctypes.c_int, ctypes.c_int, ctypes.c_int]
    for k, r in enumerate(rates):
        l_.firdes_add_peak_c(out, length, r, window, 1,
                             int(normalize and k == len(rates) - 1))
    return out.view(np.complex64)


def rtty_baudot_decoder_lookup(codes, fig_mode: int = 0):
    """Direct 5-bit codes -> ascii (libcsdr.c:1613-1621)."""
    l_ = lib()
    l_.rtty_baudot_decoder_lookup.argtypes = [ctypes.POINTER(ctypes.c_ubyte),
                                              ctypes.c_ubyte]
    l_.rtty_baudot_decoder_lookup.restype = ctypes.c_char
    mode = ctypes.c_ubyte(fig_mode)
    out = []
    for c in codes:
        ch = l_.rtty_baudot_decoder_lookup(ctypes.byref(mode), int(c))
        if ch != b"\x00":
            out.append(ch)
    return b"".join(out), mode.value


def rtty_baudot_decoder_push(symbols):
    """Framed bit symbols -> ascii via the start/stop state machine
    (libcsdr.c:1623-1654)."""
    l_ = lib()
    state = (ctypes.c_ubyte * 64)()  # > sizeof(rtty_baudot_decoder_t), zeroed
    l_.rtty_baudot_decoder_push.argtypes = [ctypes.POINTER(ctypes.c_ubyte),
                                            ctypes.c_ubyte]
    l_.rtty_baudot_decoder_push.restype = ctypes.c_char
    out = []
    for s in symbols:
        ch = l_.rtty_baudot_decoder_push(state, int(s))
        if ch != b"\x00":
            out.append(ch)
    return b"".join(out)


def amdemod_estimator_cf(x, alpha=0.947543636291, beta=0.392485425092):
    l_ = lib()
    xi = as_cf(x)
    out = np.zeros(len(x), np.float32)
    l_.amdemod_estimator_cf.argtypes = [f32p, f32p, ctypes.c_int,
                                        ctypes.c_float, ctypes.c_float]
    l_.amdemod_estimator_cf(xi, out, len(x), alpha, beta)
    return out


def deemphasis_nfm_ff(x, sample_rate):
    l_ = lib()
    x = np.ascontiguousarray(x, np.float32)
    out = np.zeros(len(x), np.float32)
    l_.deemphasis_nfm_ff.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_int]
    l_.deemphasis_nfm_ff.restype = ctypes.c_int
    n = l_.deemphasis_nfm_ff(x, out, len(x), sample_rate)
    return out[:n]


def fmmod_fc(x, last_phase=0.0):
    l_ = lib()
    x = np.ascontiguousarray(x, np.float32)
    out = np.zeros(2 * len(x), np.float32)
    l_.fmmod_fc.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_float]
    l_.fmmod_fc.restype = ctypes.c_float
    ph = l_.fmmod_fc(x, out, len(x), last_phase)
    return out.view(np.complex64), ph


def apply_fir_cc(x, taps):
    l_ = lib()
    xi = as_cf(x)
    t = as_cf(np.ascontiguousarray(taps, np.complex64))
    out = np.zeros(2 * len(x), np.float32)
    l_.apply_fir_cc.argtypes = [f32p, f32p, ctypes.c_int, f32p, ctypes.c_int]
    l_.apply_fir_cc.restype = ctypes.c_int
    n = l_.apply_fir_cc(xi, out, len(x), t, len(taps))
    return out.view(np.complex64)[:n]


def firdes_rrc_f(length, samples_per_symbol, beta):
    l_ = lib()
    out = np.zeros(length, np.float32)
    l_.firdes_rrc_f.argtypes = [f32p, ctypes.c_int, ctypes.c_int,
                                ctypes.c_float]
    l_.firdes_rrc_f(out, length, samples_per_symbol, beta)
    return out


def firdes_cosine_f(length, samples_per_symbol):
    l_ = lib()
    out = np.zeros(length, np.float32)
    l_.firdes_cosine_f.argtypes = [f32p, ctypes.c_int, ctypes.c_int]
    l_.firdes_cosine_f(out, length, samples_per_symbol)
    return out
