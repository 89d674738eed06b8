from remfx_tpu.chain.inference import ChainInference, DEFAULT_ORDER
from remfx_tpu.chain.pipeline import PipelineChain

__all__ = ["ChainInference", "DEFAULT_ORDER", "PipelineChain"]
