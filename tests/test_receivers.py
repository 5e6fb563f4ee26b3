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
    # USB: a 0.02-rate tone appears at +0.02 in the passband [0, 0.1]
    n = 1 << 16
    tone = np.exp(1j * 2 * np.pi * 0.02 * np.arange(n)).astype(np.complex64)
    pipe = receivers.ssb_receiver(0.0, 0.1, 0.05, agc_on=False)
    ins = pipe.blocks[0].input_size
    nn = (n // ins) * ins
    y = _run(pipe, tone[:nn], ins)
    seg = y[2000:]
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    peak = np.argmax(spec) / len(seg)
    assert abs(peak - 0.02) < 0.002, peak
    # and a tone outside the passband is rejected
    tone2 = np.exp(-1j * 2 * np.pi * 0.2 * np.arange(n)).astype(np.complex64)
    y2 = _run(pipe, tone2[:nn], ins)
    assert np.abs(y2[2000:]).mean() < 0.01 * np.abs(y[2000:]).mean()


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
