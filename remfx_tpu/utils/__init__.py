from remfx_tpu.utils.crop import causal_crop, center_crop
from remfx_tpu.utils.logging import get_logger

__all__ = ["causal_crop", "center_crop", "get_logger"]
