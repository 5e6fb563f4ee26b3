"""Shared test helpers: reference bindings import + SNR-based comparison
(BASELINE.md: acceptance is SNR-bound for float DSP, bit-exact for byte
domain)."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent / "ref"))
import refbind  # noqa: E402

from csdr_tpu.core import cplx  # noqa: E402

def to_dev(x):
    """np complex64 -> planar CF on device; REAL arrays pass through as
    plain device arrays (the _ff ops' contract).  Wrapping reals in CF fed
    jnp.asarray a CF downstream, which degenerates into the Python
    sequence protocol: one EAGER gather per element (~30 s per 2000-sample
    test on an idle box — the r4 'suite hang')."""
    import jax.numpy as jnp
    x = np.asarray(x)
    if np.iscomplexobj(x):
        return cplx.from_numpy(x)
    return jnp.asarray(x)


def to_host(x):
    if isinstance(x, cplx.CF):
        return cplx.to_numpy(x)
    return np.asarray(x)

__all__ = ["refbind", "snr_db", "assert_snr", "cplx_noise", "real_noise",
           "to_dev", "to_host", "interpret_is_exact"]


def interpret_is_exact() -> bool:
    """CSDR_PALLAS_INTERPRET emulates pallas kernels with plain jnp ops;
    only on CPU do their DEFAULT-precision dots stay f32-exact.  On the
    TPU backend the emulation's dots run single-pass bf16 (~1e-3), so
    interpret-vs-silicon equivalence asserts are CPU-only (the silicon
    kernel itself is still compared against the XLA fallback on-chip)."""
    import jax
    return jax.default_backend() == "cpu"


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-error ratio in dB between a reference and a test signal."""
    ref = np.asarray(ref)
    test = np.asarray(test)
    assert ref.shape == test.shape, f"{ref.shape} vs {test.shape}"
    err = np.abs(ref - test) ** 2
    sig = np.abs(ref) ** 2
    if err.sum() == 0:
        return np.inf
    return 10 * np.log10(sig.sum() / err.sum())


def assert_snr(ref, test, min_db: float = 90.0, what: str = ""):
    s = snr_db(ref, test)
    assert s >= min_db, f"{what}: SNR {s:.1f} dB < {min_db} dB"
    return s


def cplx_noise(n: int, seed: int = 0, scale: float = 0.5) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return (scale * (rng.standard_normal(n) + 1j * rng.standard_normal(n))).astype(np.complex64)


def real_noise(n: int, seed: int = 0, scale: float = 0.5) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return (scale * rng.standard_normal(n)).astype(np.float32)
