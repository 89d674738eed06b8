"""Model registry.

Backbone families mirroring the reference's five removal models
(remfx/models.py:259-390) + the Cnn14 classifier (remfx/classifier.py).
Constructors are config-driven (the cfg/model/*.yaml surface).
"""

import inspect

from remfx_tpu.models.cnn14 import Cnn14
from remfx_tpu.models.tcn import TCN
from remfx_tpu.models.dcunet import DCUNet
from remfx_tpu.models.demucs import HDemucs
from remfx_tpu.models.dptnet import DPTNet
from remfx_tpu.models.umx import OpenUnmix, UMXSeparator
from remfx_tpu.models.wrappers import ModelWrapper
from remfx_tpu.utils.logging import get_logger

log = get_logger(__name__)


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
    remat=True,
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
        remat=remat,
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


def make_umx(
    sample_rate=48000,
    n_fft=2048,
    hop_length=512,
    n_channels=1,
    alpha=0.3,
    hidden_size=512,
    niter=0,
    softmask=False,
    residual=False,
    wiener_win_len=300,
    identity_init=False,
    **_ignored,
) -> ModelWrapper:
    module = UMXSeparator(
        n_fft=n_fft,
        hop_length=hop_length,
        nb_channels=n_channels,
        hidden_size=hidden_size,
        niter=niter,
        softmask=softmask,
        residual=residual,
        wiener_win_len=wiener_win_len,
        identity_init=identity_init,
    )
    return ModelWrapper(module, name="umx", takes_train_flag=True)


def make_dcunet(
    sample_rate=48000,
    architecture="Large-DCUNet-20",
    stft_kernel_size=512,
    fix_length_mode="pad",
    num_bins=1025,
    norm_type="bN",
    gauss_conv=False,
    identity_init=False,
    **_ignored,
) -> ModelWrapper:
    module = DCUNet(
        architecture=architecture,
        stft_kernel_size=stft_kernel_size,
        fix_length_mode=fix_length_mode,
        norm_type=norm_type,
        gauss_conv=gauss_conv,
        identity_init=identity_init,
    )
    return ModelWrapper(module, name="dcunet", takes_train_flag=True)


def make_dptnet(
    sample_rate=48000,
    n_src=1,
    in_chan=64,
    out_chan=64,
    chunk_size=100,
    n_repeats=2,
    fb_name="free",
    kernel_size=16,
    n_filters=64,
    stride=8,
    num_bins=1025,
    **_ignored,
) -> ModelWrapper:
    module = DPTNet(
        n_src=n_src,
        in_chan=in_chan,
        out_chan=out_chan,
        chunk_size=chunk_size,
        n_repeats=n_repeats,
        kernel_size=kernel_size,
        n_filters=n_filters,
        stride=stride,
    )
    return ModelWrapper(module, name="dptnet", takes_train_flag=True)


def make_demucs(
    sample_rate=48000,
    sources=("mixture",),
    audio_channels=1,
    nfft=4096,
    channels=48,
    depth=6,
    identity_init=False,
    **_ignored,
) -> ModelWrapper:
    # torchaudio-compatible HDemucs; depth is the TOTAL encoder depth
    # (torch default 6). The hybrid inject requires nfft to be a power
    # of 4 (time-branch stride 4^n_freq_layers == hop nfft/4).
    # identity_init: zero-init the final decoder convs + residual skip
    # in the wrapper, so training starts from exact passthrough (the
    # same plateau-escape lever as DCUNet/UMX identity_init; structure
    # and torch weight-compat unchanged — imports keep this False).
    module = HDemucs(
        sources=tuple(sources),
        audio_channels=audio_channels,
        channels=channels,
        nfft=nfft,
        depth=depth,
        zero_final=bool(identity_init),
    )
    return ModelWrapper(module, name="demucs", takes_train_flag=True,
                        residual=bool(identity_init))


MODEL_REGISTRY = {
    "tcn": make_tcn,
    "umx": make_umx,
    "dcunet": make_dcunet,
    "dptnet": make_dptnet,
    "demucs": make_demucs,
}


def make_model(name: str, **kwargs) -> ModelWrapper:
    if name not in MODEL_REGISTRY:
        raise ValueError(f"unknown model {name!r}; have {sorted(MODEL_REGISTRY)}")
    fn = MODEL_REGISTRY[name]
    # every factory takes **_ignored so reference-YAML surplus keys
    # don't crash, but a swallowed key is how model.network.hidden_size
    # once silently sized the wrong net — surface what's dropped
    named = {
        p.name
        for p in inspect.signature(fn).parameters.values()
        if p.kind in (p.POSITIONAL_OR_KEYWORD, p.KEYWORD_ONLY)
    }
    extra = sorted(set(kwargs) - named)
    if extra:
        log.warning("model %r ignores network config keys: %s", name, extra)
    return fn(**kwargs)


__all__ = ["TCN", "Cnn14", "ModelWrapper", "make_model", "make_cnn14", "MODEL_REGISTRY"]
