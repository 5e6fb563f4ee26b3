from csdr_tpu.core.block import Block, Pipeline, stateless

__all__ = ["Block", "Pipeline", "stateless"]
