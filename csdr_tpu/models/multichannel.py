"""Flagship multichannel pipeline — BASELINE config 5: a 64-channel fastddc
FFT channelizer feeding per-channel BPSK31 Gardner symbol recovery + DBPSK
decode, channels sharded across a device mesh.

TPU design: the channelizer runs channel x time sharded
(parallel/sharded_ddc.py, fused single-matmul inverse); the per-channel
modem (the reference RX chain of grc_tests/bpsk31_ber.py:16-26 —
timing_recovery_cc GARDNER + dbpsk_decoder_c_u8) is a lax.scan over symbol
slots, vmapped over the LOCAL channel rows inside a 'chan'-sharded
shard_map.  Between the two stages the channel streams are resharded from
P('chan','time') to P('chan', None): an all_gather along 'time' of the
already-decimated (tiny) channel streams, the corner turn the reference's
ddcd performs with per-client pipes (ddcd_old.h:59-61).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from csdr_tpu.core.cplx import CF
from csdr_tpu.ops import digital, fastddc as fd, sync
from csdr_tpu.parallel import sharded_ddc


def build_ddc_bpsk31_bank(mesh: Mesh, shift_rates, decimation: int,
                          sps: int = 256, use_costas: bool = False,
                          costas_bw: float = 2 * np.pi / 100,
                          tr_segments: int = 1, tr_subchunks: int = 1):
    """Returns (init, step): step(state, x CF wideband P('time')) ->
    (state', (bits (C, cap) u8, counts (C,))).

    shift_rates: per-channel `shift=` rates (reference convention: mix by
    +rate, so a channel centered at -rate comes to baseband).  sps: modem
    samples/symbol at the decimated rate (must be divisible by 4).
    use_costas: run a per-channel BPSK Costas loop before the Gardner TED
    (carrier recovery for mistuned channels — config 5's "Costas/Gardner").
    The Costas scan runs per channel sample, so enable it at low channel
    rates; the DBPSK decode itself needs no carrier lock.
    tr_segments: >1 runs the Gardner TED in the overlap-discard segmented
    mode (ops/sync.py; BER-certified vs the serial loop in
    tests/test_segmented_ted.py).  NOTE: measured a LOSS at the 64-channel
    flagship shape (r4 on-chip, docs/ROUND4.md) — the per-segment warmup
    dominates at ~103 symbols/chunk; keep the serial default here.
    tr_subchunks: >1 feeds each channel's chunk to the TED as that many
    SEQUENTIAL sub-chunk applies (the TED's own streaming contract;
    bit-identical outputs, tests/test_multichannel.py).  Standalone the
    scan's gather cost scales with the buffer domain (2.14 -> 0.67 ms at
    half domain), but COMPOSED in the flagship subchunks=2 measured 1213
    vs 1390 Msps — in context the modem already runs well below the
    standalone scan micro, so the extra applies only serialize.  Default 1.
    """
    ddc = fd.fastddc_init(0.05, decimation)
    bank_step, meta = sharded_ddc.build_ddc_bank_step(mesh, ddc, shift_rates)
    c_total = len(shift_rates)
    n_chan = mesh.shape["chan"]

    tr = sync.timing_recovery_block("GARDNER", sps, loop_gain=0.5,
                                    max_error=2.0, use_q=True,
                                    segments=tr_segments)
    if use_costas:
        cl_alpha, cl_beta, cl_dmax = sync.costas_loop_params(costas_bw)

    def _ted_dbpsk(tr_state, last, ch_re, ch_im):
        """TED + DBPSK over one channel chunk, optionally as tr_subchunks
        sequential TED applies (domain-bounded gathers); bits packed
        back-to-back (valid prefix, symbol-rate dus writes)."""
        k = tr_subchunks if ch_re.shape[0] % tr_subchunks == 0 else 1
        if k != tr_subchunks:
            # loud, not silent: an explicitly requested sub-chunked A/B
            # config must not quietly measure the k=1 path (r4 advisor);
            # traces once, so this warns once per compile
            import warnings
            warnings.warn(
                f"tr_subchunks={tr_subchunks} does not divide the "
                f"per-channel chunk ({ch_re.shape[0]}); falling back to "
                "the serial k=1 TED", stacklevel=2)
        if k == 1:
            tr_state, syms = tr.apply(tr_state, CF(ch_re, ch_im))
            bits, last = digital.dbpsk_decoder_c_u8(syms.data, last,
                                                    count=syms.count)
            return tr_state, last, bits, syms.count
        sub = ch_re.shape[0] // k
        parts, counts = [], []
        for i in range(k):
            tr_state, syms = tr.apply(
                tr_state, CF(ch_re[i * sub:(i + 1) * sub],
                             ch_im[i * sub:(i + 1) * sub]))
            b_i, last = digital.dbpsk_decoder_c_u8(syms.data, last,
                                                   count=syms.count)
            parts.append(b_i)
            counts.append(syms.count)
        cap = parts[0].shape[0]
        bits = jnp.zeros((k * cap,), jnp.uint8)
        off = jnp.int32(0)
        for i in range(k):
            bits = jax.lax.dynamic_update_slice(bits, parts[i], (off,))
            off = off + counts[i]
        return tr_state, last, bits, off

    def modem_one(state, ch_re, ch_im):
        """One channel: (costas ->) gardner -> dbpsk (symbols -> bits)."""
        tr_state, last = state
        if use_costas:
            (tr_state, costas_state) = tr_state
            y, _e, _d, costas_state = sync.bpsk_costas_loop_cc(
                CF(ch_re, ch_im), cl_alpha, cl_beta, cl_dmax,
                state=costas_state)
            ch_re, ch_im = y.re, y.im
            tr_state, new_last, bits, count = _ted_dbpsk(
                tr_state, last, ch_re, ch_im)
            return ((tr_state, costas_state), new_last), bits, count
        # first decoded bit of the stream pairs with the zero-init last
        # sample; the count excludes nothing — caller aligns, as in the
        # reference BER harness (+-5 byte search, bpsk31_ber.py:35-42)
        tr_state, new_last, bits, count = _ted_dbpsk(
            tr_state, last, ch_re, ch_im)
        return (tr_state, new_last), bits, count

    # state layout: 6 base arrays (TED buffer re/im, occ, corr, dbpsk last
    # re/im) + 3 costas scalars per channel when enabled; every array has a
    # leading channel axis so P('chan') shards them all
    n_state = 9 if use_costas else 6

    def _pack(trs, last):
        if use_costas:
            ted, costas = trs
            return (ted[0].re, ted[0].im, ted[1], ted[2], last.re, last.im,
                    *costas)
        return (trs[0].re, trs[0].im, trs[1], trs[2], last.re, last.im)

    def _unpack(sa):
        ted = (CF(sa[0], sa[1]), sa[2], sa[3])
        last = CF(sa[4], sa[5])
        if use_costas:
            return ((ted, (sa[6], sa[7], sa[8])), last)
        return (ted, last)

    def modem_shard(*args):
        st, (y_re, y_im) = args[:n_state], args[n_state:]

        def one(*a):
            state = _unpack(a[:n_state])
            (trs, last), bits, count = modem_one(state, a[n_state],
                                                 a[n_state + 1])
            return _pack(trs, last) + (bits, count)

        return jax.vmap(one)(*st, y_re, y_im)

    modem_fn = jax.shard_map(
        modem_shard, mesh=mesh,
        in_specs=tuple([P("chan")] * n_state
                       + [P("chan", None), P("chan", None)]),
        out_specs=tuple([P("chan")] * n_state + [P("chan", None), P("chan")]),
        check_vma=False)

    def init(n_wideband: int):
        """n_wideband: wideband chunk length (per step), to size the modem
        input buffers: m = per-channel samples per chunk."""
        ins = meta["input_size"]
        # per-channel samples per chunk, from the channelizer's classed
        # plan: frames are processed in groups of q emitting group_out
        # samples each (fused path: q=1, group_out=post_input/post) —
        # (frames*pis)//post over-counts when pis % post != 0 (ADVICE r1)
        frames = n_wideband // ins
        q, ga = meta["q"], meta["group_out"]
        assert frames % q == 0, (frames, q)
        m = (frames // q) * ga
        sh = NamedSharding(mesh, P("chan"))

        def put(a):
            return jax.device_put(a, sh)

        buf, occ, corr = tr.init(m)
        state = [put(jnp.tile(buf.re[None, :], (c_total, 1))),
                 put(jnp.tile(buf.im[None, :], (c_total, 1))),
                 put(jnp.tile(occ[None], (c_total,))),
                 put(jnp.tile(corr[None], (c_total,))),
                 put(jnp.zeros((c_total,), jnp.float32)),   # dbpsk last re
                 put(jnp.zeros((c_total,), jnp.float32))]   # dbpsk last im
        if use_costas:
            state += [put(jnp.zeros((c_total,), jnp.float32))
                      for _ in range(3)]   # nco_phase, freq, dphase
        return tuple(state)

    @jax.jit
    def step(state, x: CF):
        y = bank_step(x)                                   # (C, m) chan,time
        # corner turn: gather each channel's full (decimated) stream
        y = CF(jax.lax.with_sharding_constraint(
                   y.re, NamedSharding(mesh, P("chan", None))),
               jax.lax.with_sharding_constraint(
                   y.im, NamedSharding(mesh, P("chan", None))))
        out = modem_fn(*state, y.re, y.im)
        return tuple(out[:n_state]), (out[n_state], out[n_state + 1])

    return init, step, meta


def example_flagship(mesh: Mesh, frames_per_shard: int = 4, c_total: int = 8,
                     decimation: int = 16, sps: int = 256,
                     tr_segments: int = 1):
    """Build + example input for compile checks / dryrun."""
    rng = np.random.default_rng(3)
    rates = rng.uniform(-0.35, 0.35, c_total)
    init, step, meta = build_ddc_bpsk31_bank(mesh, rates, decimation, sps,
                                             tr_segments=tr_segments)
    n = mesh.shape["time"] * frames_per_shard * meta["input_size"]
    x = CF(jnp.asarray(rng.standard_normal(n), jnp.float32),
           jnp.asarray(rng.standard_normal(n), jnp.float32))
    state = init(n)
    return state, step, x, rates
