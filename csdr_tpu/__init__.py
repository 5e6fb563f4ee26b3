"""csdr_tpu — a TPU-native software-defined-radio DSP framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of ha7ilm/csdr
(reference surveyed in SURVEY.md).  Instead of one C kernel per Unix process
streaming 1k-sample chunks over pipes, every DSP block here is a pure
``(state, block) -> (state, block)`` JAX transform over large device-resident
sample blocks; pipelines are function composition compiled into a single XLA
program; multi-chip scaling uses ``shard_map`` over a ``jax.sharding.Mesh``
with collective halo exchange replacing the reference's memmove-overlap
(csdr.c:1164-1176) and pipe/TCP plumbing (nmux.cpp, ddcd_old.cpp).

Block naming follows the reference CLI (README.md:126-153): ``_ff`` float in /
float out, ``_cc`` complex in/out, ``_cf`` complex in / float out, etc.
Complex streams are planar float32 pairs (``core.cplx.CF``) — the axon TPU
backend has no complex dtype, and planar layout is what the VPU/MXU want.
"""

from csdr_tpu import firdes
from csdr_tpu.core.block import Block, Pipeline, VarOut, stateless
from csdr_tpu.core.checkpoint import load_state, save_state
from csdr_tpu.core.cplx import CF
from csdr_tpu.core.stream import StreamRunner, run_offline

__version__ = "0.1.0"

__all__ = [
    "firdes",
    "Block",
    "Pipeline",
    "VarOut",
    "CF",
    "stateless",
    "StreamRunner",
    "run_offline",
    "save_state",
    "load_state",
    "__version__",
]
