"""Planar complex sample type: the framework's L0 data model.

The reference's L0 is an interleaved float pair struct (complexf,
libcsdr.h:46-66).  The TPU-native equivalent is NOT jnp.complex64 — TPU
backends lower complex to float pairs anyway, Pallas has no complex dtype,
and the axon TPU runtime rejects complex ops outright.  So the native sample
type here is :class:`CF`: a pytree of two float32 planes (re, im).  Planar
(structure-of-arrays) beats interleaved on TPU: every elementwise op is pure
VPU work on dense f32 lanes with no (de)interleave relayouts, and the
polyphase FIR / FFT kernels consume the planes directly.

complex64 ndarrays appear only at host edges (tests, file I/O).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class CF:
    re: Any
    im: Any

    # -- pytree protocol -------------------------------------------------
    def tree_flatten(self):
        return (self.re, self.im), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- shape/layout ----------------------------------------------------
    @property
    def shape(self):
        return self.re.shape

    @property
    def ndim(self):
        return self.re.ndim

    @property
    def dtype(self):
        return self.re.dtype

    def __len__(self):
        return self.re.shape[0]

    def __getitem__(self, idx) -> "CF":
        return CF(self.re[idx], self.im[idx])

    # Fail fast instead of the implicit sequence protocol: np/jnp.asarray
    # of a CF would otherwise iterate __len__/__getitem__ — one EAGER
    # device gather per element (minutes per MB; bit us in r4 via a real-op
    # helper handed a CF).  Use .re/.im or cplx.to_numpy explicitly.
    __iter__ = None
    __array__ = None

    def reshape(self, *shape) -> "CF":
        return CF(self.re.reshape(*shape), self.im.reshape(*shape))

    def astype(self, dtype) -> "CF":
        return CF(self.re.astype(dtype), self.im.astype(dtype))

    # -- arithmetic ------------------------------------------------------
    def __add__(self, o):
        if isinstance(o, CF):
            return CF(self.re + o.re, self.im + o.im)
        return CF(self.re + o, self.im)

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, CF):
            return CF(self.re - o.re, self.im - o.im)
        return CF(self.re - o, self.im)

    def __rsub__(self, o):
        return CF(o - self.re, -self.im)

    def __mul__(self, o):
        if isinstance(o, CF):
            return CF(self.re * o.re - self.im * o.im,
                      self.re * o.im + self.im * o.re)
        return CF(self.re * o, self.im * o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, CF):
            d = o.re * o.re + o.im * o.im
            return CF((self.re * o.re + self.im * o.im) / d,
                      (self.im * o.re - self.re * o.im) / d)
        return CF(self.re / o, self.im / o)

    def __neg__(self):
        return CF(-self.re, -self.im)

    # -- complex helpers -------------------------------------------------
    def conj(self) -> "CF":
        return CF(self.re, -self.im)

    def abs2(self):
        return self.re * self.re + self.im * self.im

    def abs(self):
        return jnp.sqrt(self.abs2())

    def angle(self):
        return jnp.arctan2(self.im, self.re)

    # -- constructors ----------------------------------------------------
    @staticmethod
    def zeros(shape, dtype=jnp.float32) -> "CF":
        return CF(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    @staticmethod
    def full(shape, value, dtype=jnp.float32) -> "CF":
        return CF(jnp.full(shape, np.real(value), dtype),
                  jnp.full(shape, np.imag(value), dtype))

    @staticmethod
    def scalar(value=0.0) -> "CF":
        return CF(jnp.float32(np.real(value)), jnp.float32(np.imag(value)))


def expj(theta) -> CF:
    """e^{j theta} as planes (the reference's e_powj macro, libcsdr.h:56)."""
    return CF(jnp.cos(theta), jnp.sin(theta))


def from_numpy(x: np.ndarray) -> CF:
    """complex64 host array -> device CF."""
    x = np.asarray(x)
    return CF(jnp.asarray(np.ascontiguousarray(x.real), jnp.float32),
              jnp.asarray(np.ascontiguousarray(x.imag), jnp.float32))


def to_numpy(x: CF) -> np.ndarray:
    return np.asarray(x.re) + 1j * np.asarray(x.im)


def concat(parts: Sequence[CF], axis: int = 0) -> CF:
    return CF(jnp.concatenate([p.re for p in parts], axis),
              jnp.concatenate([p.im for p in parts], axis))


def stack(parts: Sequence[CF], axis: int = 0) -> CF:
    return CF(jnp.stack([p.re for p in parts], axis),
              jnp.stack([p.im for p in parts], axis))


def where(mask, a, b) -> CF:
    a = a if isinstance(a, CF) else CF.scalar(a)
    b = b if isinstance(b, CF) else CF.scalar(b)
    return CF(jnp.where(mask, a.re, b.re), jnp.where(mask, a.im, b.im))


def roll(x: CF, shift: int, axis: int = -1) -> CF:
    return CF(jnp.roll(x.re, shift, axis), jnp.roll(x.im, shift, axis))


def pad(x: CF, pad_width) -> CF:
    return CF(jnp.pad(x.re, pad_width), jnp.pad(x.im, pad_width))


def is_cf(x) -> bool:
    return isinstance(x, CF)
