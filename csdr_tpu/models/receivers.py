"""Receiver models for the remaining BASELINE configs (3: NFM, 4: SSB) plus
AM — composed exactly like the reference command pipelines (README.md:85-124).
"""

from __future__ import annotations

from csdr_tpu import firdes
from csdr_tpu.core.block import Pipeline, stateless
from csdr_tpu.ops import agc, demod, fftfilt, fir, util_ops


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
                 transition_bw: float = 0.05, decimation: int = 50,
                 front_bw: float = 0.005, agc_on: bool = True,
                 use_pallas: bool = True) -> Pipeline:
    """BASELINE config 4, the reference's full SSB chain (README.md:110):
    fir_decimate_cc 50 | bandpass_fir_fft_cc 0 0.1 | realpart_cf | agc_ff
    | limit_ff.  The decimator runs the 2.4 Msps front end on the MXU; the
    per-sample agc_ff scan then only sees the 48 ksps audio rate — exactly
    the reference's own placement (per-sample feedback loops are ~1 Msps on
    TPU, so they belong at decimated rates; SURVEY.md §7 hard parts #2).
    Chunk sizes must be multiples of decimation * the bandpass input_size.
    """
    front = firdes.firdes_lowpass_f(firdes.firdes_filter_len(front_bw),
                                    0.5 / decimation)
    bp = fftfilt.bandpass_fir_fft_block(low_cut, high_cut, transition_bw)
    import jax
    blocks = [
        # HIGH (bf16x3, ~107 dB) on the 801-tap front: -113 us e2e on-chip
        # (r5 prefix profile, docs/ROUND5.md) with the audio SNR bound
        # untouched
        fir.fir_decimate_block(front, decimation, use_pallas=use_pallas,
                               precision=jax.lax.Precision.HIGH),
        bp,
        stateless("realpart_cf", demod.realpart_cf),
    ]
    if agc_on:
        blocks.append(agc.agc_block())
    blocks.append(stateless("limit_ff", lambda x: util_ops.limit_ff(x, 1.0)))
    return Pipeline(blocks, name="ssb")


def am_receiver(decimation: int = 50, transition_bw: float = 0.05,
                front_bw: float = 0.005, use_pallas: bool = True) -> Pipeline:
    """The reference's AM chain (README.md:95):
    fir_decimate_cc 50 | amdemod_cf | fastdcblock_ff | agc_ff | limit_ff."""
    taps = firdes.firdes_lowpass_f(firdes.firdes_filter_len(front_bw),
                                   0.5 / decimation)
    import jax
    return Pipeline([
        fir.fir_decimate_block(taps, decimation, use_pallas=use_pallas,
                               precision=jax.lax.Precision.HIGH),
        stateless("amdemod_cf", demod.amdemod_cf),
        util_ops.fastdcblock_block(),
        agc.agc_block(),
        stateless("limit_ff", lambda x: util_ops.limit_ff(x, 1.0)),
    ], name="am")
