"""Checkpoint/resume: snapshot a receiver's carry mid-stream, resume in a
fresh pipeline object, outputs must be bit-identical to the uninterrupted
run (SURVEY.md §5.4 — the carry IS the stream history)."""

import os
import tempfile

import jax
import numpy as np

from csdr_tpu.core import checkpoint
from csdr_tpu.core.cplx import CF
from csdr_tpu.models import wfm


def _tone_fm(n, fs=240_000):
    t = np.arange(n) / fs
    audio = 0.5 * np.sin(2 * np.pi * 1000 * t)
    phase = 2 * np.pi * np.cumsum(audio) * 75_000 / fs
    return np.exp(1j * phase).astype(np.complex64)


def test_checkpoint_resume_bit_identical():
    iq = _tone_fm(4 * 24_000)
    blocks = np.split(iq, 4)

    pipe = wfm.wfm_basic()
    apply = jax.jit(pipe.apply)

    def dev(b):
        return CF(jax.numpy.asarray(b.real), jax.numpy.asarray(b.imag))

    def host(y):
        # VarOut -> valid samples
        return np.asarray(y.data)[: int(np.asarray(y.count))]

    # uninterrupted run
    st = pipe.init()
    outs = []
    for b in blocks:
        st, y = apply(st, dev(b))
        outs.append(host(y))

    # run 2 blocks, checkpoint, resume in a FRESH pipeline
    st = pipe.init()
    for b in blocks[:2]:
        st, _ = apply(st, dev(b))
    path = tempfile.mktemp(suffix=".npz")
    try:
        checkpoint.save_state(path, st)
        pipe2 = wfm.wfm_basic()
        apply2 = jax.jit(pipe2.apply)
        # steady-state template: some blocks size their state lazily on the
        # first apply, so run one dummy chunk to get the full structure
        like, _ = apply2(pipe2.init(), dev(blocks[0]))
        st2 = checkpoint.load_state(path, like)
        for i, b in enumerate(blocks[2:]):
            st2, y = apply2(st2, dev(b))
            np.testing.assert_array_equal(host(y), outs[2 + i])
    finally:
        os.unlink(path)


def test_checkpoint_shape_mismatch_fails_loudly():
    import pytest
    pipe = wfm.wfm_basic()
    st = pipe.init()
    path = tempfile.mktemp(suffix=".npz")
    try:
        checkpoint.save_state(path, st)
        with pytest.raises(ValueError):
            checkpoint.load_state(path, (st, st))  # wrong structure
    finally:
        os.unlink(path)


def test_checkpoint_treedef_and_dtype_mismatch_fail_loudly():
    """Same leaf count/shapes but different tree STRUCTURE must be rejected
    (stored treedef compared on load), and a dtype mismatch must raise
    instead of silently coercing (ADVICE r1)."""
    import pytest
    import jax.numpy as jnp
    a = jnp.zeros((4,), jnp.float32)
    b = jnp.ones((4,), jnp.float32)
    path = tempfile.mktemp(suffix=".npz")
    try:
        checkpoint.save_state(path, (a, (b,)))
        # identical leaves, different nesting -> treedef mismatch
        with pytest.raises(ValueError, match="tree structure"):
            checkpoint.load_state(path, ((a,), (b,)))
        # right structure, wrong dtype -> dtype mismatch
        with pytest.raises(ValueError, match="dtype"):
            checkpoint.load_state(
                path, (a, (jnp.ones((4,), jnp.int32),)))
        # exact structure restores fine
        st = checkpoint.load_state(path, (a, (b,)))
        np.testing.assert_array_equal(np.asarray(st[1][0]), np.ones(4))
    finally:
        os.unlink(path)


def test_flagship_sharded_state_checkpoint_roundtrip():
    """Checkpoint/resume of the DISTRIBUTED pipeline: snapshot the
    flagship's chan-sharded modem state mid-stream, restore into a fresh
    bank on the mesh, outputs must match the uninterrupted run."""
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from csdr_tpu.models import multichannel

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("chan", "time"))
    state, step, x, rates = multichannel.example_flagship(
        mesh, frames_per_shard=2, c_total=4, decimation=16, sps=64)
    sh = NamedSharding(mesh, P("time"))
    from csdr_tpu.core.cplx import CF as _CF
    x = _CF(jax.device_put(x.re, sh), jax.device_put(x.im, sh))

    # continuous: two steps
    s1, (bits_a1, counts_a1) = step(state, x)
    s2, (bits_a2, counts_a2) = step(s1, x)

    # checkpointed: step, save, rebuild, load, step
    s1b, _ = step(state, x)
    path = tempfile.mktemp(suffix=".npz")
    try:
        checkpoint.save_state(path, s1b)
        state2, step2, meta2 = multichannel.build_ddc_bpsk31_bank(
            mesh, rates, 16, 64)
        like = state2(x.shape[0])
        restored = checkpoint.load_state(path, like)
        _, (bits_b2, counts_b2) = step2(restored, x)
        np.testing.assert_array_equal(np.asarray(counts_a2),
                                      np.asarray(counts_b2))
        np.testing.assert_array_equal(np.asarray(bits_a2),
                                      np.asarray(bits_b2))
    finally:
        os.unlink(path)
