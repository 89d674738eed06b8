"""Model registry.

Backbone families mirroring the reference's five removal models
(remfx/models.py:259-390) + the Cnn14 classifier (remfx/classifier.py).
Constructors are config-driven (the cfg/model/*.yaml surface).
"""

from remfx_tpu.models.cnn14 import Cnn14
from remfx_tpu.models.tcn import TCN
from remfx_tpu.models.wrappers import ModelWrapper


def make_tcn(
    sample_rate=48000,
    num_bins=1025,
    ninputs=1,
    noutputs=1,
    nblocks=20,
    channel_growth=0,
    channel_width=256,
    kernel_size=7,
    stack_size=10,
    dilation_growth=2,
    causal=False,
    **_ignored,
) -> ModelWrapper:
    module = TCN(
        ninputs=ninputs,
        noutputs=noutputs,
        nblocks=nblocks,
        channel_growth=channel_growth,
        channel_width=channel_width,
        kernel_size=kernel_size,
        stack_size=stack_size,
        dilation_growth=dilation_growth,
        causal=causal,
    )
    return ModelWrapper(module, name="tcn")


def make_cnn14(
    num_classes=5,
    sample_rate=48000,
    model_sample_rate=48000,
    n_fft=2048,
    hop_length=512,
    n_mels=128,
    specaugment=False,
    **_ignored,
):
    return Cnn14(
        num_classes=num_classes,
        sample_rate=sample_rate,
        model_sample_rate=model_sample_rate,
        n_fft=n_fft,
        hop_length=hop_length,
        n_mels=n_mels,
        specaugment=specaugment,
    )


MODEL_REGISTRY = {
    "tcn": make_tcn,
}


def make_model(name: str, **kwargs) -> ModelWrapper:
    if name not in MODEL_REGISTRY:
        raise ValueError(f"unknown model {name!r}; have {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name](**kwargs)


__all__ = ["TCN", "Cnn14", "ModelWrapper", "make_model", "make_cnn14", "MODEL_REGISTRY"]
