"""Sample-format converters (reference libcsdr.c:2363-2437, csdr.c:534-633).

All converters map to/from float32 in [-1, 1] with the same scale constants as
the reference (u8 biased by 128, s16 scaled by SHRT_MAX, s24 packed LE/BE).
Real converters operate elementwise; complex streams are interleaved I,Q on
the wire, so byte-domain functions take the interleaved view and the
``*_c`` helpers pair them into complex64.
"""

from __future__ import annotations

import jax.numpy as jnp

from csdr_tpu.core.cplx import CF

UCHAR_MAX = 255
SCHAR_MAX = 127
SHRT_MAX = 32767
INT_MAX = 2147483647


def convert_u8_f(x):
    """u8 -> f32: x/127.5 - 1 (reference libcsdr.c:2365-2368)."""
    return x.astype(jnp.float32) / (UCHAR_MAX / 2.0) - 1.0


def convert_s8_f(x):
    return x.astype(jnp.float32) / SCHAR_MAX


def convert_s16_f(x):
    return x.astype(jnp.float32) / SHRT_MAX


def convert_f_u8(x):
    """f32 -> u8: x*127.5 + 128, wrapping like the C float->uchar store
    (reference libcsdr.c:2387-2392: no clipping before the cast).  The
    int32 hop matters: XLA's direct f32->u8 SATURATES, while the C cast
    truncates then takes the low byte (x86 cvttss2si) — verified
    bit-identical to the reference binary in tests/test_binary_parity.py."""
    return (x * (UCHAR_MAX * 0.5) + 128).astype(jnp.int32).astype(jnp.uint8)


def convert_f_s8(x):
    return (x * SCHAR_MAX).astype(jnp.int32).astype(jnp.int8)


def convert_f_s16(x):
    """f32 -> s16 with C-style truncation toward zero, no clipping
    (reference libcsdr.c:2399-2407).  Out-of-range samples wrap through
    the int32 hop exactly like the C store (XLA's direct f32->s16 would
    saturate instead)."""
    return (x * SHRT_MAX).astype(jnp.int32).astype(jnp.int16)


def convert_s24_f(b, bigendian: bool = False):
    """Packed 24-bit -> f32 (reference libcsdr.c:2427-2441).

    ``b`` is a uint8 array of length 3*n.  The reference builds a 32-bit int
    with the 24-bit word in the TOP bytes (<<8), then divides by INT_MAX-256.
    """
    b = b.reshape(-1, 3).astype(jnp.int32)
    if bigendian:
        temp = (b[:, 2] << 24) | (b[:, 1] << 16) | (b[:, 0] << 8)
    else:
        temp = (b[:, 0] << 24) | (b[:, 1] << 16) | (b[:, 2] << 8)
    return temp.astype(jnp.float32) / jnp.float32(INT_MAX - 256)


def convert_f_s24(x, bigendian: bool = False):
    """f32 -> packed 24-bit LE/BE (reference libcsdr.c:2409-2425)."""
    temp = (x * (INT_MAX >> 8)).astype(jnp.int32)
    b0 = (temp & 0xFF).astype(jnp.uint8)
    b1 = ((temp >> 8) & 0xFF).astype(jnp.uint8)
    b2 = ((temp >> 16) & 0xFF).astype(jnp.uint8)
    if bigendian:
        return jnp.stack([b0, b1, b2], axis=-1).reshape(-1)
    return jnp.stack([b2, b1, b0], axis=-1).reshape(-1)


def interleaved_to_cf(x):
    """float32 interleaved I,Q -> planar CF (the L0 data-model bridge,
    reference libcsdr.h:46-66)."""
    x = x.reshape(-1, 2)
    return CF(x[:, 0], x[:, 1])


def cf_to_interleaved(x: CF):
    return jnp.stack([x.re, x.im], axis=-1).reshape(-1).astype(jnp.float32)


def convert_u8_c(b) -> CF:
    """Interleaved u8 I/Q bytes -> planar complex (rtl_sdr wire format)."""
    return interleaved_to_cf(convert_u8_f(b))


def convert_s16_c(b) -> CF:
    return interleaved_to_cf(convert_s16_f(b))


def mono2stereo_s16(x):
    """Duplicate each s16 sample (reference csdr.c mono2stereo_i16)."""
    return jnp.repeat(x, 2)


def stereo2mono_s16(x):
    """Average L/R pairs to mono, (l+r)//2 in int32.  EXTENSION: the
    reference has no stereo2mono command (only mono2stereo_s16,
    csdr.c:2174-2189); this is its inverse for symmetry."""
    x = x.reshape(-1, 2).astype(jnp.int32)
    return ((x[:, 0] + x[:, 1]) // 2).astype(jnp.int16)
