from remfx_tpu.augment.render import EffectChainRenderer, STFT_THRESH

__all__ = ["EffectChainRenderer", "STFT_THRESH"]
