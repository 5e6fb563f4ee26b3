"""IMA ADPCM 4:1 codec (reference ima_adpcm.c:91-174; algorithm and tables
are the public IMA/DVI ADPCM standard).  Byte-domain: must be bit-exact.

Serial by construction (each step's predictor depends on the previous) ->
lax.scan over nibbles with integer state (previousValue, index), exactly the
reference's ima_adpcm_state_t carry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from csdr_tpu.core.block import Block

INDEX_ADJUST = np.array([-1, -1, -1, -1, 2, 4, 6, 8,
                         -1, -1, -1, -1, 2, 4, 6, 8], np.int32)
STEP_SIZES = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767], np.int32)

_ADJ = jnp.asarray(INDEX_ADJUST)
_STEPS = jnp.asarray(STEP_SIZES)


def _decode_step(state, delta):
    prev, index = state
    step = _STEPS[index]
    diff = step >> 3
    diff = diff + jnp.where(delta & 1, step >> 2, 0)
    diff = diff + jnp.where(delta & 2, step >> 1, 0)
    diff = diff + jnp.where(delta & 4, step, 0)
    diff = jnp.where(delta & 8, -diff, diff)
    prev = jnp.clip(prev + diff, -32768, 32767)
    index = jnp.clip(index + _ADJ[delta], 0, 88)
    return (prev, index), prev


def _encode_step(state, sample):
    prev, index = state
    step = _STEPS[index]
    diff = sample.astype(jnp.int32) - prev
    sign = diff < 0
    diff = jnp.abs(diff)
    b2 = diff >= step
    diff = jnp.where(b2, diff - step, diff)
    step1 = step >> 1
    b1 = diff >= step1
    diff = jnp.where(b1, diff - step1, diff)
    b0 = diff >= (step >> 1 >> 1)
    delta = (jnp.where(sign, 8, 0) + jnp.where(b2, 4, 0)
             + jnp.where(b1, 2, 0) + jnp.where(b0, 1, 0)).astype(jnp.int32)
    state, _ = _decode_step(state, delta)
    return state, delta


def encode_ima_adpcm(samples, state=(0, 0)):
    """s16 samples -> packed u8 (two nibbles/byte, LOW nibble first —
    reference ima_adpcm.c:146-155).  Returns (bytes_u8, state')."""
    prev = jnp.asarray(state[0], jnp.int32)
    idx = jnp.asarray(state[1], jnp.int32)
    st, deltas = jax.lax.scan(_encode_step, (prev, idx),
                              jnp.asarray(samples, jnp.int16))
    pairs = deltas.reshape(-1, 2)
    packed = (pairs[:, 0] | (pairs[:, 1] << 4)).astype(jnp.uint8)
    return packed, st


def decode_ima_adpcm(packed, state=(0, 0)):
    """packed u8 -> s16 samples (two per byte).  Returns (samples, state')."""
    b = jnp.asarray(packed, jnp.int32)
    deltas = jnp.stack([b & 0xF, (b >> 4) & 0xF], axis=1).reshape(-1)
    prev = jnp.asarray(state[0], jnp.int32)
    idx = jnp.asarray(state[1], jnp.int32)
    st, out = jax.lax.scan(_decode_step, (prev, idx), deltas)
    return out.astype(jnp.int16), st


def encode_block() -> Block:
    def init():
        return (jnp.int32(0), jnp.int32(0))

    def apply(state, x):
        y, state = encode_ima_adpcm(x, state)
        return state, y

    return Block("encode_ima_adpcm_i16_u8", init, apply)


def decode_block() -> Block:
    def init():
        return (jnp.int32(0), jnp.int32(0))

    def apply(state, x):
        y, state = decode_ima_adpcm(x, state)
        return state, y

    return Block("decode_ima_adpcm_u8_i16", init, apply)


COMPRESS_FFT_PAD_N = 10  # reference csdr.c:1739-1744


def compress_fft_adpcm_f_u8(fft_row, fft_size: int):
    """Waterfall-row compression (reference csdr.c:1745-1768): pad the row
    with its first value PAD_N times (codec warmup garbage), scale dB floats
    by 100 to s16, ADPCM-encode with a FRESH codec state per row."""
    pad = jnp.full((COMPRESS_FFT_PAD_N,), fft_row[0], fft_row.dtype)
    data = jnp.concatenate([pad, fft_row])
    s16 = (data * 100).astype(jnp.int16)
    packed, _ = encode_ima_adpcm(s16, (0, 0))
    return packed
