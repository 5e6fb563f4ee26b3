"""End-to-end smoke + sanity for the NFM / SSB / AM receiver models."""

import numpy as np

from csdr_tpu.core.block import VarOut
from csdr_tpu.models import receivers
from tests.util import to_dev, to_host


def _run(pipe, x, n_chunk):
    st = pipe.init()
    outs = []
    for c in range(len(x) // n_chunk):
        st, y = pipe.apply(st, to_dev(x[c * n_chunk:(c + 1) * n_chunk]))
        outs.append(np.asarray(y.data if isinstance(y, VarOut) else y))
    return np.concatenate([o if o.ndim == 1 else o for o in outs])


def test_nfm_receiver_recovers_tone():
    fs = 400_000
    n = fs
    t = np.arange(n) / fs
    audio = 0.5 * np.sin(2 * np.pi * 800 * t)
    phase = 2 * np.pi * np.cumsum(audio) * 2500 / fs   # 2.5 kHz dev NFM
    x = np.exp(1j * phase).astype(np.complex64)
    pipe = receivers.nfm_receiver(decimation=50, audio_rate=8000,
                                  use_pallas=False)
    au = _run(pipe, x, 50_000)
    seg = au[2000:6000]
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    peak = np.argmax(spec) * 8000 / len(seg)
    assert abs(peak - 800) < 10, peak


def test_ssb_receiver_recovers_tone():
    # full reference chain: decimate-50 front end, then USB bandpass.
    # a 0.0005-rate input tone lands at +0.025 in the decimated passband
    d = 50
    pipe = receivers.ssb_receiver(0.0, 0.1, 0.05, decimation=d,
                                  agc_on=False, use_pallas=False)
    ins = d * pipe.blocks[1].input_size
    n = ins * max(1, (1 << 20) // ins)
    tone = np.exp(1j * 2 * np.pi * 0.0005 * np.arange(n)).astype(np.complex64)
    y = _run(pipe, tone, ins)
    seg = y[2000:]
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    peak = np.argmax(spec) / len(seg)       # rfft bin k -> rate k/n
    assert abs(peak - 0.0005 * d) < 0.002, peak
    # a tone at -0.004 passes the front lowpass (cutoff 0.01) but lands at
    # -0.2 after decimation: outside the USB passband -> rejected
    tone2 = np.exp(-1j * 2 * np.pi * 0.004 * np.arange(n)).astype(np.complex64)
    y2 = _run(pipe, tone2, ins)
    assert np.abs(y2[2000:]).mean() < 0.02 * np.abs(y[2000:]).mean()


def test_am_receiver_recovers_envelope():
    fs = 100_000
    n = fs
    t = np.arange(n) / fs
    audio = 0.5 * np.sin(2 * np.pi * 600 * t)
    x = ((1.0 + audio) * 0.5).astype(np.float32) * np.exp(
        1j * 2 * np.pi * 0.0 * np.arange(n))
    x = x.astype(np.complex64)
    pipe = receivers.am_receiver(decimation=10, use_pallas=False)
    au = _run(pipe, x, 20_000)
    seg = au[2000:8000]
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    peak = np.argmax(spec) * 10_000 / len(seg)
    assert abs(peak - 600) < 10, peak
