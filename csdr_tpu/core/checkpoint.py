"""Checkpoint/resume for streaming state.

The reference has no checkpointing, but every stateful kernel externalizes
its state into a caller-owned POD struct (SURVEY.md §5.4) — here that
discipline is explicit: every block's state is a pytree carry, so a
checkpoint is just the carry serialized.  A long-running receiver (or the
ddcd server) can snapshot mid-stream and resume bit-identically: the carry
contains ALL stream history (NCO phases, FIR tails, IIR/AGC carries,
timing-recovery offsets).

Format: .npz with flattened leaves + a json treedef; no pickle, so
checkpoints are portable and inspectable.
"""

from __future__ import annotations

import json

import jax
import numpy as np


def save_state(path: str, state) -> None:
    """Serialize a block/pipeline state pytree to ``path`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(_treedef_repr(treedef)).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_state(path: str, like) -> object:
    """Load a state checkpoint, structured like the pytree ``like``.

    ``like`` must have the checkpoint's structure: use ``block.init()``,
    or — for blocks whose state is lazily sized on the first apply (e.g.
    the fractional decimator) — the carry after one apply on a dummy chunk.
    Tree structure (stored treedef vs ``like``'s), shapes, and dtypes are
    all checked leaf by leaf so a mismatched pipeline fails loudly, not
    numerically."""
    with np.load(path) as z:
        leaves_like, treedef = jax.tree_util.tree_flatten(like)
        if "__treedef__" in z.files:
            stored = bytes(z["__treedef__"]).decode()
            want = json.dumps(_treedef_repr(treedef))
            if stored != want:
                raise ValueError(
                    "checkpoint tree structure does not match pipeline "
                    f"state:\n  checkpoint: {json.loads(stored)}\n"
                    f"  state:      {_treedef_repr(treedef)}")
        n = sum(1 for k in z.files if k.startswith("leaf_"))
        if n != len(leaves_like):
            raise ValueError(
                f"checkpoint has {n} leaves, pipeline state has "
                f"{len(leaves_like)}")
        leaves = []
        for i, ref in enumerate(leaves_like):
            a = z[f"leaf_{i}"]
            ref_arr = np.asarray(ref)
            if a.shape != ref_arr.shape:
                raise ValueError(
                    f"leaf {i}: checkpoint shape {a.shape} != "
                    f"state shape {ref_arr.shape}")
            if a.dtype != ref_arr.dtype:
                raise ValueError(
                    f"leaf {i}: checkpoint dtype {a.dtype} != "
                    f"state dtype {ref_arr.dtype}")
            leaves.append(a)
        return jax.tree_util.tree_unflatten(treedef, leaves)


def _treedef_repr(treedef) -> str:
    return str(treedef)
