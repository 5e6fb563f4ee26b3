"""Block/state protocol: the TPU-native replacement for csdr's process model.

The reference runs one stateful C kernel per process, the caller carrying tiny
POD state structs across ``fread -> kernel -> fwrite`` iterations
(libcsdr.h:151-170, csdr.c:359-392).  Here a *block* is a pure function

    apply(state, x) -> (state', y)

over a device-resident sample array, with ``state`` an arbitrary pytree (the
checkpointable carry).  A :class:`Pipeline` composes blocks into ONE function
of the same shape, so an entire receiver jits into a single XLA program —
the fusion-based equivalent of a shell pipeline of csdr processes.

Variable-rate blocks (timing recovery, fractional decimator, varicode...)
return a :class:`VarOut` — a fixed-capacity array plus a valid count — to keep
shapes static under jit (SURVEY.md §7 "shape discipline").
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp


class VarOut(NamedTuple):
    """Fixed-capacity output with a dynamic valid count.

    ``data[:count]`` is meaningful; the tail is padding (implementation-
    defined values).  This replaces the reference's variable ``output_size``
    return convention (e.g. libcsdr.c:607-636 rational_resampler,
    libcsdr.c:1977-2072 timing_recovery) under XLA static shapes.
    """

    data: jax.Array
    count: jax.Array  # int32 scalar

    def compact(self) -> jax.Array:
        """Host-side: materialize only the valid prefix (forces a sync)."""
        return jax.device_get(self.data)[: int(self.count)]


@dataclasses.dataclass(frozen=True)
class Block:
    """A named, stateful stream transform.

    init(**overrides) -> state pytree (None for stateless blocks)
    apply(state, x)   -> (state', y) where y is an Array or VarOut
    """

    name: str
    init: Callable[..., Any]
    apply: Callable[[Any, Any], tuple[Any, Any]]
    # Output samples to drop once at stream start so that framing matches the
    # reference's valid-mode (no zero history) output; see ops/fir.py.
    warmup_out: int = 0
    # out_samples / in_samples for this block: 1.0 for rate-preserving
    # stages, 1/D for decimators, I for interpolators, None when the ratio
    # is data-dependent (VarOut producers like timing recovery).  Used to
    # convert upstream warmup counts into downstream sample rates so
    # Pipeline.warmup_out is EXACT; a None ratio with nonzero upstream
    # warmup makes Pipeline.warmup_out raise instead of silently guessing.
    rate_ratio: float | None = 1.0

    def __call__(self, state: Any, x: Any) -> tuple[Any, Any]:
        return self.apply(state, x)


def stateless(name: str, fn: Callable[[Any], Any]) -> Block:
    """Wrap a pure elementwise/shape-preserving function as a Block.

    VarOut inputs pass through transparently (fn maps the data, the valid
    count is preserved) so elementwise stages compose after variable-rate
    blocks without special casing."""

    def apply(s, x):
        if isinstance(x, VarOut):
            return s, VarOut(fn(x.data), x.count)
        return s, fn(x)

    return Block(name=name, init=lambda: None, apply=apply)


class Pipeline:
    """Composition of Blocks into one ``(state, x) -> (state, y)`` function.

    The pipeline state is a tuple of per-block states; the whole apply is
    jittable.  This is the architectural replacement for the reference's
    "the shell pipe is the flowgraph" model (SURVEY.md §1 L2): stage
    boundaries become XLA fusion boundaries instead of process boundaries.
    """

    def __init__(self, blocks: Sequence[Block], name: str = "pipeline"):
        self.blocks = list(blocks)
        self.name = name

    def init(self) -> tuple:
        return tuple(b.init() for b in self.blocks)

    def apply(self, state: tuple, x: Any) -> tuple[tuple, Any]:
        if len(state) != len(self.blocks):
            # a silently-short zip would skip trailing blocks and return a
            # mid-pipeline intermediate as the final output (e.g. a state
            # checkpointed before a block was appended)
            raise ValueError(
                f"{self.name}: state has {len(state)} entries for "
                f"{len(self.blocks)} blocks")
        new_states = []
        for b, s in zip(self.blocks, state):
            s, x = b.apply(s, x)
            new_states.append(s)
        return tuple(new_states), x

    def __call__(self, state: tuple, x: Any) -> tuple[tuple, Any]:
        return self.apply(state, x)

    @property
    def warmup_out(self) -> int:
        """EXACT start-of-stream samples to drop at the pipeline OUTPUT:
        each block's warmup (counted in its own output samples) is carried
        through the downstream blocks' rate ratios.  Raises if a block with
        a data-dependent rate (rate_ratio=None) sits downstream of pending
        warmup — exact framing is undefined there, and callers must frame
        per block instead of silently using a wrong count."""
        w = 0.0
        for b in self.blocks:
            r = b.rate_ratio
            if r is None:
                if w > 0:
                    raise ValueError(
                        f"pipeline '{self.name}': block '{b.name}' has a "
                        "data-dependent rate downstream of pending warmup; "
                        "exact warmup_out is undefined — drop warmup per "
                        "block or pass drop_warmup=False")
                w = float(b.warmup_out)
            else:
                w = w * r + float(b.warmup_out)
        return int(round(w))

    def jit_apply(self, **jit_kwargs) -> Callable:
        return jax.jit(self.apply, **jit_kwargs)


def chain(*blocks: Block, name: str = "pipeline") -> Pipeline:
    return Pipeline(blocks, name=name)
