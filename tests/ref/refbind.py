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


def agc_ff(x, reference=1.0, attack_rate=0.01, decay_rate=0.001, max_gain=65535.0,
           hang_time=200, attack_wait_time=0, gain_filter_alpha=0.999, last_gain=1.0):
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
