"""Receiver models for the remaining BASELINE configs (3: NFM, 4: SSB) plus
AM — composed exactly like the reference command pipelines (README.md:85-124).
"""

from __future__ import annotations

import numpy as np

from csdr_tpu import firdes
from csdr_tpu.core.block import Pipeline, stateless
from csdr_tpu.ops import agc, demod, fastddc, fftfilt, fir, util_ops


def nfm_receiver(decimation: int = 50, transition_bw: float = 0.05,
                 audio_rate: int = 8000, fastagc_block_size: int | None = None,
                 use_pallas: bool = True) -> Pipeline:
    """BASELINE config 3:
    fir_decimate_cc D | fmdemod_quadri_cf | limit_ff | deemphasis_nfm_ff
    | fastagc_ff   (reference README NFM chain).
    Chunk sizes must be multiples of D (and the fastagc block size is the
    post-decimation chunk length)."""
    taps = firdes.firdes_lowpass_f(firdes.firdes_filter_len(transition_bw),
                                   0.5 / decimation)
    blocks = [
        fir.fir_decimate_block(taps, decimation, use_pallas=use_pallas),
        demod.fmdemod_quadri_block(),
        stateless("limit_ff", lambda x: util_ops.limit_ff(x, 1.0)),
        demod.deemphasis_nfm_block(audio_rate),
    ]
    if fastagc_block_size:
        blocks.append(agc.fastagc_block(reference=1.0, block_size=fastagc_block_size))
    return Pipeline(blocks, name="nfm")


def ssb_receiver(low_cut: float = 0.0, high_cut: float = 0.1,
                 transition_bw: float = 0.01, agc_on: bool = True) -> Pipeline:
    """BASELINE config 4 (README.md:110-112 SSB recipe):
    bandpass_fir_fft_cc low high bw | realpart_cf | agc_ff | (gain)
    Chunk sizes must be multiples of the block's ``input_size``."""
    bp = fftfilt.bandpass_fir_fft_block(low_cut, high_cut, transition_bw)
    blocks = [bp, stateless("realpart_cf", demod.realpart_cf)]
    if agc_on:
        blocks.append(agc.agc_block())
    return Pipeline(blocks, name="ssb")


def am_receiver(decimation: int = 10, transition_bw: float = 0.05,
                use_pallas: bool = True) -> Pipeline:
    """AM envelope receiver (README.md:97-100):
    fir_decimate_cc D | amdemod_cf | dcblock_ff | agc_ff"""
    taps = firdes.firdes_lowpass_f(firdes.firdes_filter_len(transition_bw),
                                   0.5 / decimation)
    return Pipeline([
        fir.fir_decimate_block(taps, decimation, use_pallas=use_pallas),
        stateless("amdemod_cf", demod.amdemod_cf),
        util_ops.dcblock_block(),
        agc.agc_block(),
    ], name="am")
