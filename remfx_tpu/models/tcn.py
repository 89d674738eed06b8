"""Dilated temporal convolutional network (TCN) removal backbone.

Parity target: reference ``remfx/tcn.py`` (micro-tcn-based): ``nblocks``
dilated Conv1d blocks (kernel 7, dilation 2^(n%stack), no padding) with
PReLU and 1x1 residual (cropped), final 1x1 conv + tanh; causal or
center cropping (reference tcn.py:11-130). Receptive field for the
paper config (20 blocks, growth 2, stack 10) is 12,277 samples.

Weight-compat mapping (torch -> flax): Conv1d weight (out, in, k) ->
kernel (k, in, out); PReLU weight (out,) -> per-channel slope.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp

from remfx_tpu.utils.crop import causal_crop, center_crop


class PReLU(nn.Module):
    """Per-channel PReLU (torch.nn.PReLU(num_parameters=C) semantics)."""

    features: int
    init_slope: float = 0.25

    @nn.compact
    def __call__(self, x):
        a = self.param(
            "weight", lambda k: jnp.full((self.features,), self.init_slope)
        )
        return jnp.where(x >= 0, x, a * x)


class TCNBlock(nn.Module):
    out_ch: int
    kernel_size: int = 3
    dilation: int = 1
    crop_fn: Callable = causal_crop

    @nn.compact
    def __call__(self, x):
        """x: (B, T, C) features-last."""
        y = nn.Conv(
            self.out_ch,
            (self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding="VALID",
            use_bias=True,
            name="conv1",
        )(x)
        y = PReLU(self.out_ch, name="relu")(y)
        res = nn.Conv(self.out_ch, (1,), use_bias=False, name="res")(x)
        # crop along time (axis -2 here)
        res = jnp.swapaxes(
            self.crop_fn(jnp.swapaxes(res, -1, -2), y.shape[-2]), -1, -2
        )
        return y + res


class TCN(nn.Module):
    ninputs: int = 1
    noutputs: int = 1
    nblocks: int = 4
    channel_growth: int = 0
    channel_width: int = 32
    kernel_size: int = 13
    stack_size: int = 10
    dilation_growth: int = 10
    causal: bool = False
    remat: bool = False  # rematerialize per block: the paper config's
    # activations (20 blocks x (16, 262k, 256) bf16 ~ 2 GB each) exceed
    # HBM in the backward pass; remat trades one extra forward per block

    @nn.compact
    def __call__(self, x):
        """x: (B, C_in, T) channel-first like the reference -> (B, C_out, T')."""
        crop_fn = causal_crop if self.causal else center_crop
        block_cls = nn.remat(TCNBlock) if self.remat else TCNBlock
        h = jnp.swapaxes(x, -1, -2)  # (B, T, C)
        out_ch = -1
        for n in range(self.nblocks):
            in_ch = out_ch if n > 0 else self.ninputs
            out_ch = (
                in_ch * self.channel_growth
                if self.channel_growth > 1
                else self.channel_width
            )
            dilation = self.dilation_growth ** (n % self.stack_size)
            h = block_cls(
                out_ch,
                self.kernel_size,
                dilation,
                crop_fn,
                name=f"block{n}",
            )(h)
        y = nn.Conv(self.noutputs, (1,), use_bias=True, name="output")(h)
        return jnp.tanh(jnp.swapaxes(y, -1, -2))

    def compute_receptive_field(self) -> int:
        rf = self.kernel_size
        for n in range(1, self.nblocks):
            dilation = self.dilation_growth ** (n % self.stack_size)
            rf = rf + (self.kernel_size - 1) * dilation
        return rf
