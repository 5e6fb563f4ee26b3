"""Spectrum / waterfall path (SURVEY.md §2.8): windowed FFT framing, power
logs, frame averaging, side exchange, ADPCM row compression glue.

All batched: a chunk yields B frames -> ONE batched planar FFT.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from csdr_tpu import firdes
from csdr_tpu.core import cplx, fft as cfft
from csdr_tpu.core.block import Block
from csdr_tpu.core.cplx import CF


def logpower_cf(x: CF, add_db: float = 0.0):
    """10*log10(|x|^2) + add_db (reference libcsdr.c:1296-1302)."""
    return (10.0 * jnp.log10(x.abs2()) + add_db).astype(jnp.float32)


def accumulate_power_cf(x: CF, acc):
    """acc += |x|^2 (reference libcsdr.c:1304-1307)."""
    return acc + x.abs2()


def log_ff(x, add_db: float = 0.0):
    return (10.0 * jnp.log10(x) + add_db).astype(jnp.float32)


def total_logpower_cf(x: CF):
    """10*log10(mean power) (reference libcsdr.c:1315-1321; mean over ALL
    elements — a batched (B, fft) input divides by B*fft, not B)."""
    return 10.0 * jnp.log10(jnp.sum(x.abs2()) / x.re.size)


def fft_exchange_sides_ff(x):
    """Swap halves of real FFT rows (reference csdr.c:1697-1715).
    Works on (..., fft_size)."""
    return jnp.roll(x, x.shape[-1] // 2, axis=-1)


def fft_one_side_ff(x):
    """Keep the positive half (reference csdr.c:1717-1734)."""
    return x[..., : x.shape[-1] // 2]


def fft_cc_block(fft_size: int, every_n_samples: int,
                 window: str = firdes.WINDOW_DEFAULT) -> Block:
    """Windowed FFT of the first fft_size of every every_n_samples input
    samples (reference csdr.c:1569-1644).  Chunk must be a multiple of
    every_n_samples; emits (B, fft_size) spectra.

    - every_n >= fft_size: frames are the first fft_size samples of each
      every_n stride (the reference 'skips' the rest).
    - every_n < fft_size: overlapped mode — frame ends at each stride
      boundary, carrying fft_size - every_n history samples.
    """
    assert cfft.log2n(fft_size) != -1, "fft_size should be power of 2"
    wt = jnp.asarray(firdes.precalculate_window(fft_size, window))
    ov = max(fft_size - every_n_samples, 0)

    def init():
        return CF.zeros((ov,))

    def _frames_strided(arr, b):
        """frame i = arr[i*ins : i*ins + fft_size] via shifted reshapes
        (a (B, fft) gather compiles pathologically on TPU)."""
        ins = every_n_samples
        chunks = []
        need = ((fft_size - 1) // ins) * ins + b * ins
        if need > arr.shape[0]:
            arr = jnp.concatenate(
                [arr, jnp.zeros((need - arr.shape[0],), arr.dtype)])
        for cpos in range(0, fft_size, ins):
            w = min(ins, fft_size - cpos)
            chunks.append(arr[cpos: cpos + b * ins].reshape(b, ins)[:, :w])
        return jnp.concatenate(chunks, axis=1)

    def apply(tail, x):
        n = x.shape[0]
        assert n % every_n_samples == 0
        b = n // every_n_samples
        if ov:
            xcat = cplx.concat([tail, x])
            frames = CF(_frames_strided(xcat.re, b), _frames_strided(xcat.im, b))
            new_tail = xcat[n:]
        else:
            frames = CF(_frames_strided(x.re, b), _frames_strided(x.im, b))
            new_tail = tail
        frames = frames * wt
        return new_tail, _fft_batched(frames)

    return Block("fft_cc", init, apply)


def _fft_batched(frames: CF) -> CF:
    """Batched natural-order FFT: the VMEM matmul-FFT kernel on TPU for
    supported sizes (kernels/fft_pallas.py; one HBM round trip + an XLA
    tile-shuffle reorder), Stockham elsewhere."""
    import os
    import jax
    from csdr_tpu.kernels import fft_pallas as fk

    n = frames.shape[-1]
    b = int(frames.shape[0]) if frames.re.ndim > 1 else 1
    if fk.use_kernel(n, b):
        return fk.fft_natural(frames)
    return cfft.fft(frames)


def fft_fc_block(fft_out_size: int, every_n_samples: int,
                 window: str = firdes.WINDOW_DEFAULT) -> Block:
    """Real-input variant (reference csdr.c:3414-3498).  The parameter is
    the number of OUTPUT bins: each frame consumes 2*fft_out_size real
    samples and emits the positive-frequency half of the windowed
    2N-point FFT ("This makes it easier to replace fft_cc by fft_fc in
    some applications" — the output row width matches fft_cc's)."""
    blk = fft_cc_block(2 * fft_out_size, every_n_samples, window)

    def apply(tail, x):
        st, spectra = blk.apply(tail, CF(jnp.asarray(x, jnp.float32),
                                         jnp.zeros_like(x, jnp.float32)))
        return st, CF(spectra.re[..., :fft_out_size],
                      spectra.im[..., :fft_out_size])

    return Block("fft_fc", blk.init, apply)


def logaveragepower_cf(spectra: CF, add_db: float, avgnumber: int):
    """Average groups of ``avgnumber`` FFT power frames then log
    (reference csdr.c:1663-1695; note its add_db -= 10*log10(avgnumber)).
    spectra: (B, fft_size) with B a multiple of avgnumber ->
    (B/avgnumber, fft_size) float."""
    b, n = spectra.shape
    p = spectra.abs2().reshape(b // avgnumber, avgnumber, n).sum(axis=1)
    return log_ff(p, add_db - 10.0 * np.log10(avgnumber))


def logaveragepower_block(add_db: float, fft_size: int, avgnumber: int) -> Block:
    """Flat-sample form (what the CLI pumps): reshapes the chunk to
    (B, fft_size) rows, averages groups of ``avgnumber``, emits flat."""
    def init():
        return None

    def apply(state, x):
        sp = x.reshape(-1, fft_size)
        return state, logaveragepower_cf(sp, add_db, avgnumber).reshape(-1)

    return Block("logaveragepower_cf", init, apply)


def compress_fft_adpcm_rows(rows, fft_size: int):
    """Batch the reference's compress_fft_adpcm_f_u8 over waterfall rows
    (each row gets a fresh codec state, csdr.c:1745-1768) -> (B, bytes)."""
    import jax
    from csdr_tpu.ops.adpcm import compress_fft_adpcm_f_u8

    return jax.vmap(lambda r: compress_fft_adpcm_f_u8(r, fft_size))(rows)
