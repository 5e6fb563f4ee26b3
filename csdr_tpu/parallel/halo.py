"""Halo exchange and cross-device scan fixups for time-sharded streams.

The reference keeps taps_length-1 samples of history per block with
memmove-overlap (csdr.c:1164-1176) and carries IIR state in POD structs.
Sharding the time axis over a mesh turns those into:

- FIR history  -> a ``ppermute`` halo: each shard receives the last
  ``halo`` samples of its left neighbor (zeros for shard 0, matching the
  zero-initialized stream tail of the single-chip path — bit-identical
  boundary math, SURVEY.md §7 "bit-stable multi-host overlap").
- 1-pole IIR carry -> a device-axis parallel scan: every shard computes its
  local affine reduction (B, A) with y_out = B*y_in + A, all shards gather
  the P pairs (tiny), compute an exclusive prefix locally, and correct the
  local outputs.  Exact to float-associativity; no serial device chain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from csdr_tpu.core.cplx import CF


def _right_perm(axis_name: str):
    n = jax.lax.axis_size(axis_name)
    return [(i, (i + 1) % n) for i in range(n)]


def halo_from_left(x, halo: int, axis_name: str):
    """Return the last ``halo`` elements of the LEFT neighbor's shard
    (zeros on the first shard).  Works on arrays and CF."""
    if isinstance(x, CF):
        return CF(halo_from_left(x.re, halo, axis_name),
                  halo_from_left(x.im, halo, axis_name))
    tail = x[-halo:]
    recv = jax.lax.ppermute(tail, axis_name, _right_perm(axis_name))
    idx = jax.lax.axis_index(axis_name)
    return jnp.where(idx == 0, jnp.zeros_like(recv), recv)


def concat_with_left_halo(x, halo: int, axis_name: str):
    """[left-neighbor tail | local shard] — the sharded form of the
    streaming blocks' ``concat([tail, x])``."""
    h = halo_from_left(x, halo, axis_name)
    if isinstance(x, CF):
        return CF(jnp.concatenate([h.re, x.re]), jnp.concatenate([h.im, x.im]))
    return jnp.concatenate([h, x])


def affine_scan_fixup(b_total, a_total, y0, axis_name: str):
    """Cross-device prefix for affine recurrences y_out = B*y_in + A.

    Each shard passes its local reduction (b_total, a_total) — scalars —
    and the global initial carry y0; returns the carry entering this shard.
    Cost: one all_gather of 2*P floats.
    """
    idx = jax.lax.axis_index(axis_name)
    bs = jax.lax.all_gather(b_total, axis_name)        # (P,)
    as_ = jax.lax.all_gather(a_total, axis_name)
    p = bs.shape[0]

    def step(carry, i):
        new = jnp.where(i < idx, bs[i] * carry + as_[i], carry)
        return new, None

    carry, _ = jax.lax.scan(step, jnp.asarray(y0, jnp.float32),
                            jnp.arange(p))
    return carry
