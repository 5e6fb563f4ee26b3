"""Flagship config-5 end-to-end test: C BPSK31 transmissions at different
center frequencies mixed into ONE wideband stream; the channel x time
sharded fastddc bank + vmapped Gardner/DBPSK modem must recover every
channel's bits (models/multichannel.py) on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from csdr_tpu.core.cplx import CF
from csdr_tpu.models import bpsk31, multichannel
from csdr_tpu.ops import fastddc as fd


def _mesh(chan, time):
    devs = np.array(jax.devices()[: chan * time]).reshape(chan, time)
    return Mesh(devs, ("chan", "time"))


def _align_errs(a, b, window=6):
    best = None
    for shift in range(-window, window):
        x, y = a, b
        if shift < 0:
            x = np.concatenate([np.zeros(-shift, np.uint8), x])
        elif shift > 0:
            y = np.concatenate([np.zeros(shift, np.uint8), y])
        m = min(len(x), len(y))
        errs = int(np.sum(x[:m] != y[:m]))
        if best is None or errs < best[0]:
            best = (errs, m)
    return best


def test_flagship_multichannel_bpsk31():
    decim = 16
    sps = 64                      # samples/symbol at the channel rate
    c_total = 4
    mesh = _mesh(2, 4)
    rng = np.random.default_rng(9)
    centers = np.array([-0.3, -0.1, 0.15, 0.35])

    # per-channel TX at the WIDEBAND rate: interpolation sps*decim, then
    # shift to each channel's center
    texts = [bytes(f"CHANNEL {i} DE CSDR_TPU PSE K ".encode()) * 4
             for i in range(c_total)]
    tx_bits, wide = [], None
    nmin = None
    basebands = []
    for t in texts:
        bits, bb = bpsk31.tx_chain(t, interpolation=sps * decim)
        tx_bits.append(np.asarray(bits))
        basebands.append(bb)
        nmin = bb.shape[0] if nmin is None else min(nmin, bb.shape[0])

    ddc = fd.fastddc_init(0.05, decim)
    ins = ddc.input_size
    n_time = mesh.shape["time"]
    # chunk: one step; trim to a whole number of frames per shard
    n = (nmin // (ins * n_time)) * ins * n_time
    k = np.arange(n)
    acc = np.zeros(n, np.complex64)
    for bb, f in zip(basebands, centers):
        z = (np.asarray(bb.re[:n]) + 1j * np.asarray(bb.im[:n]))
        acc += (z * np.exp(2j * np.pi * f * k)).astype(np.complex64)
    acc += 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))

    init, step, meta = multichannel.build_ddc_bpsk31_bank(
        mesh, [-f for f in centers], decim, sps)
    state = init(n)
    sh = NamedSharding(mesh, P("time"))
    x = CF(jax.device_put(jnp.asarray(acc.real.astype(np.float32)), sh),
           jax.device_put(jnp.asarray(acc.imag.astype(np.float32)), sh))
    state, (bits, counts) = jax.block_until_ready(step(state, x))
    bits = np.asarray(bits)
    counts = np.asarray(counts)

    for c in range(c_total):
        got = bits[c, : counts[c]]
        # drop the modem's start-up symbols (timing acquisition)
        errs, total = _align_errs(tx_bits[c][8:], got[8:])
        assert total > 200, (c, total)
        ber = errs / total
        assert ber < 0.02, (c, ber, errs, total)


def test_flagship_classed_decimation_buffer_sizing():
    """D=50 (pis % post != 0 -> phase-classed channelizer): the modem
    buffer size from init() must match the bank's actual per-channel
    output length per step (ADVICE r1: (frames*pis)//post over-counted
    for classed plans)."""
    decim = 50
    sps = 64
    mesh = _mesh(2, 4)
    ddc = fd.fastddc_init(0.05, decim)
    assert ddc.post_input_size % ddc.post_decimation != 0, \
        "test needs a classed decimation"
    init, step, meta = multichannel.build_ddc_bpsk31_bank(
        mesh, [-0.2, 0.1, 0.25, -0.05], decim, sps)
    n_time = mesh.shape["time"]
    q, ga, ins = meta["q"], meta["group_out"], meta["input_size"]
    n = n_time * q * ins * 2            # 2 groups per shard
    state = init(n)
    # TED carry = the fixed 4*sps margin tail, chunk-size independent
    # (r4: the (m+margin,) ring was the modem's HBM wall — ops/sync.py)
    assert state[0].shape == (4, 4 * sps)
    rng = np.random.default_rng(11)
    sh = NamedSharding(mesh, P("time"))
    x = CF(jax.device_put(jnp.asarray(
               rng.standard_normal(n), jnp.float32), sh),
           jax.device_put(jnp.asarray(
               rng.standard_normal(n), jnp.float32), sh))
    state, (bits, counts) = jax.block_until_ready(step(state, x))
    assert np.asarray(bits).shape[0] == 4
    # second step reuses the carried state (shape-stable streaming)
    state, _ = jax.block_until_ready(step(state, x))


@pytest.mark.parametrize("use_costas", [True, False])
def test_flagship_costas_recovers_carrier_offset(use_costas):
    """With a residual carrier offset too large for DBPSK alone, the
    per-channel Costas loop must recover the text (and without it the BER
    must be visibly bad — proving the offset is non-trivial)."""
    decim = 16
    sps = 64
    mesh = _mesh(2, 4)
    centers = np.array([-0.25, 0.2])
    delta = 0.00025          # wideband offset -> 0.004 at channel rate

    texts = [b"COSTAS CHANNEL %d TEST " % i * 6 for i in range(2)]
    tx_bits, basebands = [], []
    nmin = None
    for t in texts:
        bits, bb = bpsk31.tx_chain(t, interpolation=sps * decim)
        tx_bits.append(np.asarray(bits))
        basebands.append(bb)
        nmin = bb.shape[0] if nmin is None else min(nmin, bb.shape[0])

    ddc = fd.fastddc_init(0.05, decim)
    n = (nmin // (ddc.input_size * 4)) * ddc.input_size * 4
    k = np.arange(n)
    acc = np.zeros(n, np.complex64)
    for bb, f in zip(basebands, centers):
        z = np.asarray(bb.re[:n]) + 1j * np.asarray(bb.im[:n])
        acc += (z * np.exp(2j * np.pi * (f + delta) * k)).astype(np.complex64)

    init, step, meta = multichannel.build_ddc_bpsk31_bank(
        mesh, [-f for f in centers], decim, sps, use_costas=use_costas)
    state = init(n)
    sh = NamedSharding(mesh, P("time"))
    x = CF(jax.device_put(jnp.asarray(acc.real.astype(np.float32)), sh),
           jax.device_put(jnp.asarray(acc.imag.astype(np.float32)), sh))
    state, (bits, counts) = jax.block_until_ready(step(state, x))
    bits, counts = np.asarray(bits), np.asarray(counts)

    bers = []
    for c in range(2):
        got = bits[c, : counts[c]]
        errs, total = _align_errs(tx_bits[c][16:], got[16:])
        assert total > 150, (c, total)
        bers.append(errs / total)
    if use_costas:
        assert max(bers) < 0.03, bers
    else:
        # sanity: the offset genuinely breaks DBPSK-only reception
        assert max(bers) > 0.1, bers


def test_flagship_subchunked_modem_identical():
    """tr_subchunks=K feeds the TED K sequential sub-chunks per step (the
    TED's own streaming contract), so the packed bits/counts must equal
    the single-apply modem exactly (models/multichannel.py, r4)."""
    decim = 16
    sps = 64
    mesh = _mesh(2, 4)
    rates = [-0.2, 0.1, 0.25, -0.05]
    rng = np.random.default_rng(21)
    n = mesh.shape["time"] * 4 * fd.fastddc_init(0.05, decim).input_size
    sh = NamedSharding(mesh, P("time"))
    x = CF(jax.device_put(jnp.asarray(
               rng.standard_normal(n), jnp.float32), sh),
           jax.device_put(jnp.asarray(
               rng.standard_normal(n), jnp.float32), sh))

    def run(k):
        init, step, meta = multichannel.build_ddc_bpsk31_bank(
            mesh, rates, decim, sps, tr_subchunks=k)
        state = init(n)
        outs = []
        for _ in range(3):
            state, (bits, counts) = jax.block_until_ready(step(state, x))
            b = np.asarray(bits)
            c = np.asarray(counts)
            outs.append([b[i, :c[i]] for i in range(len(rates))])
        return outs

    ref = run(1)
    sub = run(2)
    for step_i, (r_chans, s_chans) in enumerate(zip(ref, sub)):
        for ch, (r, s) in enumerate(zip(r_chans, s_chans)):
            np.testing.assert_array_equal(
                r, s, err_msg=f"step {step_i} chan {ch}")


def test_flagship_segmented_ted_on_mesh():
    """VERDICT r4 #8: the segmented TED must actually EXECUTE segmented
    under shard_map (every prior mesh run fell back to the serial scan via
    the degenerate-span guard).  Chunk sized so each channel gives every
    segment >= warmup_symbols symbols; BER parity with the serial bank on
    real BPSK31 transmissions."""
    decim = 16
    sps = 64
    segments = 4
    warm = 32                     # ops/sync.py warmup_symbols default
    mesh = _mesh(2, 4)
    rng = np.random.default_rng(13)
    centers = np.array([-0.3, -0.1, 0.15, 0.35])
    texts = [bytes(f"SEGMENTED TED CH {i} DE CSDR_TPU K ".encode()) * 4
             for i in range(4)]
    tx_bits, basebands, nmin = [], [], None
    for t in texts:
        bits, bb = bpsk31.tx_chain(t, interpolation=sps * decim)
        tx_bits.append(np.asarray(bits))
        basebands.append(bb)
        nmin = bb.shape[0] if nmin is None else min(nmin, bb.shape[0])

    ddc = fd.fastddc_init(0.05, decim)
    ins = ddc.input_size
    n_time = mesh.shape["time"]
    n = (nmin // (ins * n_time)) * ins * n_time
    k = np.arange(n)
    acc = np.zeros(n, np.complex64)
    for bb, f in zip(basebands, centers):
        z = np.asarray(bb.re[:n]) + 1j * np.asarray(bb.im[:n])
        acc += (z * np.exp(2j * np.pi * f * k)).astype(np.complex64)
    acc += 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    sh = NamedSharding(mesh, P("time"))
    x = CF(jax.device_put(jnp.asarray(acc.real.astype(np.float32)), sh),
           jax.device_put(jnp.asarray(acc.imag.astype(np.float32)), sh))

    def run(segs):
        init, step, meta = multichannel.build_ddc_bpsk31_bank(
            mesh, [-f for f in centers], decim, sps, tr_segments=segs)
        # prove the guard admits the segmented path: per-channel samples
        # per chunk m must give every segment >= warm symbols
        # (ops/sync.py degenerate-span guard, conservative n-only bound)
        frames = n // meta["input_size"]
        m = (frames // meta["q"]) * meta["group_out"]
        assert m // (segments * sps) >= warm, (m, segments * sps * warm)
        state = init(n)
        state, (bits, counts) = jax.block_until_ready(step(state, x))
        bits, counts = np.asarray(bits), np.asarray(counts)
        return [bits[c, : counts[c]] for c in range(4)]

    serial = run(1)
    seg = run(segments)
    for c in range(4):
        # both modes must decode the channel (skip TED acquisition bits)
        errs_s, tot_s = _align_errs(tx_bits[c][8:], serial[c][8:])
        errs_g, tot_g = _align_errs(tx_bits[c][8:], seg[c][8:])
        assert tot_s > 200 and tot_g > 200, (c, tot_s, tot_g)
        assert errs_s / tot_s < 0.02, (c, errs_s, tot_s)
        assert errs_g / tot_g < 0.02, (c, errs_g, tot_g)
        # and agree with each other up to seam/warmup edge slips
        errs_x, tot_x = _align_errs(serial[c][8:], seg[c][8:])
        assert errs_x / tot_x < 0.02, (c, errs_x, tot_x)
