"""Chunk-size invariance at the PIPELINE level: run_offline over the model
receiver chains must produce the same audio regardless of block_size.

Complements tests/test_chunk_invariance.py (per-CLI-command): composed
pipelines exercise cross-block state threading (FIR tails -> overlap-add
tails -> AGC carry) that single commands can't.  Tolerances are f32
reordering only — structural chunk bugs show up as O(1) deltas or length
mismatches.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from csdr_tpu import run_offline
from csdr_tpu.models import receivers, wfm


def _fm_iq(fs, n, dev=75_000.0, tone=1000.0, amp=0.5):
    t = np.arange(n) / fs
    audio = amp * np.sin(2 * np.pi * tone * t)
    phase = 2 * np.pi * np.cumsum(audio) * dev / fs
    return np.exp(1j * phase).astype(np.complex64)


def _compare(pipe, x, sizes, rtol=2e-3, atol=5e-4):
    outs = [np.asarray(run_offline(pipe(), x, block_size=s)) for s in sizes]
    n = min(map(len, outs))
    assert n > 0
    # equal total length modulo one trailing block of the larger size
    assert abs(len(outs[0]) - len(outs[1])) <= max(sizes), \
        (len(outs[0]), len(outs[1]))
    np.testing.assert_allclose(outs[0][:n], outs[1][:n],
                               rtol=rtol, atol=atol)


def test_wfm_basic_block_size_invariant():
    fs = 240_000
    x = _fm_iq(fs, fs)  # 1 s
    _compare(wfm.wfm_basic, x, (24_000, 60_000))


def test_ssb_block_size_invariant():
    fs = 2_400_000
    # decimation * bandpass input_size * k — input_size derives from the
    # plan (it moved 176 -> 178 when firdes_filter_len gained the
    # reference's float32 truncation: 4/0.05f = 79 taps)
    from csdr_tpu import firdes
    from csdr_tpu.ops import fftfilt
    _, ins, _ = fftfilt.fftfilt_plan(firdes.firdes_filter_len(0.05))
    bs1 = 50 * ins * 4
    bs2 = 50 * ins * 10
    t = np.arange(bs2 * 3)
    x = (0.4 * np.exp(2j * np.pi * (1000 / fs) * t)).astype(np.complex64)
    _compare(receivers.ssb_receiver, x, (bs1, bs2))


def test_nfm_block_size_invariant():
    fs = 400_000   # decimation 50 -> 8 ksps audio (the predefined NFM rate)
    x = _fm_iq(fs, 2 * fs, dev=5_000.0, tone=400.0)
    _compare(receivers.nfm_receiver, x, (50 * 1000, 50 * 2400))


# NOTE: no AM-chain case.  am_receiver contains fastdcblock_ff, whose DC
# estimate window IS the processing block (libcsdr.c:920-941 averages each
# buffer and ramps from the previous level), so its output depends on the
# block size BY REFERENCE DESIGN — the same exclusion as
# tests/test_chunk_invariance.py's fastdcblock_ff entry.
