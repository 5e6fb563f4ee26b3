"""WFM broadcast receivers — BASELINE.json configs 1 and 2.

Config 1 (csdr-fm basic, reference README.md:66-83):
    convert_u8_f -> fmdemod_quadri_cf -> fractional_decimator_ff 5
    -> deemphasis_wfm_ff -> (convert_f_s16 at the host edge)

Config 2 (advanced, 2.4 Msps front end):
    shift_cc <rate> -> fir_decimate_cc 10 0.05 HAMMING -> fmdemod_quadri_cf
    -> fractional_decimator_ff 5 -> deemphasis_wfm_ff
"""

from __future__ import annotations


from csdr_tpu import firdes
from csdr_tpu.core.block import Pipeline
from csdr_tpu.ops import demod, fir, resamp, shift


def wfm_basic(samp_rate: int = 240_000, audio_rate: int = 48_000,
              tau: float = 50e-6) -> Pipeline:
    """240 ksps complex64 in -> 48 ksps float audio out (VarOut)."""
    rate = samp_rate / audio_rate
    return Pipeline([
        demod.fmdemod_quadri_block(),
        resamp.fractional_decimator_block(rate),
        demod.deemphasis_wfm_block(tau, audio_rate),
    ], name="wfm_basic")


def wfm_advanced(shift_rate: float = -0.2, decimation: int = 10,
                 transition_bw: float = 0.05, window: str = firdes.HAMMING,
                 frac_rate: float = 5.0, audio_rate: int = 48_000,
                 tau: float = 50e-6, use_pallas: bool = True,
                 fuse_shift: bool | None = None) -> Pipeline:
    """2.4 Msps u8-IQ front end -> 48 ksps audio (reference csdr-fm:41 chain).

    The input is complex64 (converted at the host edge); chunk sizes must be
    multiples of ``decimation``.

    fuse_shift: run the NCO shift INSIDE the FIR VMEM kernel (one HBM pass
    over x — ops/fir.shifted_fir_decimate_block; the reference's own
    shift+decimate fusion, libcsdr_gpl.c:126-160).  None = env
    CSDR_WFM_FUSED (default on — A/B it with CSDR_WFM_FUSED=0).
    """
    import os
    if fuse_shift is None:
        fuse_shift = os.environ.get("CSDR_WFM_FUSED", "1") != "0"
    taps = firdes.firdes_lowpass_f(
        firdes.firdes_filter_len(transition_bw), 0.5 / decimation, window)
    if fuse_shift:
        import jax
        front = [fir.shifted_fir_decimate_block(
            shift_rate, taps, decimation,
            precision=jax.lax.Precision.HIGH)]
    else:
        front = [shift.shift_block(shift_rate),
                 fir.fir_decimate_block(taps, decimation,
                                        use_pallas=use_pallas)]
    return Pipeline(front + [
        demod.fmdemod_quadri_block(),
        resamp.fractional_decimator_block(frac_rate),
        demod.deemphasis_wfm_block(tau, audio_rate),
    ], name="wfm_advanced")
