"""Bisect the AM-chain device-wedger: run ONE candidate stage on TPU at the
AM bench shapes.  Usage: python _am_bisect.py <stage>"""
import sys
import numpy as np

def main(stage):
    import jax, jax.numpy as jnp
    from csdr_tpu.core import cplx
    from csdr_tpu.utils.timing import time_kernel
    rng = np.random.default_rng(0)
    n = 2_400_000
    naud = n // 50
    if stage == "amdemod":
        from csdr_tpu.ops import demod
        x = cplx.from_numpy((rng.standard_normal(naud) +
                             1j * rng.standard_normal(naud)).astype(np.complex64))
        per = time_kernel(lambda x: demod.amdemod_cf(x), x, k_pair=(64, 512))
    elif stage == "fastdcblock":
        from csdr_tpu.ops import util_ops
        blk = util_ops.fastdcblock_block()
        st = blk.init()
        x = jnp.asarray(rng.standard_normal(naud).astype(np.float32))
        per = time_kernel(lambda x, s: blk.apply(s, x)[1], x, aux=st,
                          k_pair=(64, 512))
    elif stage == "agc_audio":
        from csdr_tpu.ops import agc
        blk = agc.agc_block()
        st = blk.init()
        x = jnp.asarray(rng.standard_normal(naud).astype(np.float32))
        per = time_kernel(lambda x, s: blk.apply(s, x)[1], x, aux=st,
                          k_pair=(16, 128))
    elif stage == "front":
        from csdr_tpu import firdes
        from csdr_tpu.ops import fir
        taps = firdes.firdes_lowpass_f(firdes.firdes_filter_len(0.005), 0.01)
        blk = fir.fir_decimate_block(taps, 50)
        st = blk.init()
        x = cplx.from_numpy((rng.standard_normal(n) +
                             1j * rng.standard_normal(n)).astype(np.complex64))
        per = time_kernel(lambda x, s: blk.apply(s, x)[1], x, aux=st,
                          k_pair=(16, 128))
    elif stage == "chain":
        from csdr_tpu.models import receivers
        pipe = receivers.am_receiver()
        st = pipe.init()
        x = cplx.from_numpy((rng.standard_normal(n) +
                             1j * rng.standard_normal(n)).astype(np.complex64))
        per = time_kernel(lambda x: pipe.apply(st, x)[1], x, k_pair=(16, 128))
    else:
        raise SystemExit(f"unknown stage {stage}")
    print(f"{stage}: {per*1e6:.2f} us/call, "
          f"{(n if stage in ('front','chain') else naud)/per/1e6:.1f} Msps",
          flush=True)

if __name__ == "__main__":
    main(sys.argv[1])
