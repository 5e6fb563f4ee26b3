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
Complex streams are jnp.complex64 arrays instead of interleaved float pairs.
"""

from csdr_tpu import firdes
from csdr_tpu.core.block import Block, Pipeline, stateless
from csdr_tpu.core.stream import StreamRunner, run_offline

__version__ = "0.1.0"

__all__ = [
    "firdes",
    "Block",
    "Pipeline",
    "stateless",
    "StreamRunner",
    "run_offline",
    "__version__",
]
