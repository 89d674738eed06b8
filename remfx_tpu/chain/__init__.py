from remfx_tpu.chain.inference import ChainInference, DEFAULT_ORDER

__all__ = ["ChainInference", "DEFAULT_ORDER"]
