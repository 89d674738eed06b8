"""DPTNet — dual-path transformer on a learned filterbank.

Parity target: the reference's ``DPTNetModel`` (remfx/models.py:327-344)
wrapping ``asteroid.models.dptnet.DPTNet(n_src=1, in/out_chan=64,
chunk_size=100, n_repeats=2, fb_name="free", kernel_size=16, n_filters=64,
stride=8)`` — "Dual-Path Transformer Network" (Chen et al., 2020).

Structure: free-filterbank encoder (Conv1d 1→64, k16, s8, ReLU) →
global layer norm → chunk segmentation (chunk 100, 50% overlap) →
n_repeats × [intra-chunk transformer, inter-chunk transformer], each an
improved transformer layer (MHA + residual + LN, then BiLSTM→ReLU→Linear
feed-forward + residual + LN) → PReLU → 1x1 conv → overlap-add →
sigmoid mask → masked representation → transposed-conv decoder.

NOTE: asteroid's exact normalization/FFN details could not be verified
offline; the architecture follows the DPTNet paper + asteroid's declared
config. Training from scratch is fully supported; converter validation
is tracked for a follow-up round (same status as DCUNet).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from remfx_tpu.models.lstm import LSTM


class GlobLN(nn.Module):
    """Global layer norm over (channel, time) per example."""

    @nn.compact
    def __call__(self, x):
        # x: (B, C, T)
        g = self.param("weight", nn.initializers.ones, (x.shape[1], 1))
        b = self.param("bias", nn.initializers.zeros, (x.shape[1], 1))
        m = jnp.mean(x, axis=(1, 2), keepdims=True)
        v = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - m) / jnp.sqrt(v + 1e-8) * g + b


class MHA(nn.Module):
    dim: int
    n_heads: int = 4

    @nn.compact
    def __call__(self, x):
        # x: (S, B, D) sequence-first
        return nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, qkv_features=self.dim, name="attn"
        )(x, x)


class ImprovedTransformerLayer(nn.Module):
    dim: int
    dim_ff: int = 256
    n_heads: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (S, B, D)
        h = MHA(self.dim, self.n_heads)(x)
        x = nn.LayerNorm(name="norm_mha")(x + h)
        ff = LSTM(self.dim_ff, bidirectional=True, name="ff_lstm")(x, train)
        ff = jax.nn.relu(ff)
        ff = nn.Dense(self.dim, name="ff_out")(ff)
        x = nn.LayerNorm(name="norm_ff")(x + ff)
        return x


def _segment(x, chunk: int):
    """x: (B, C, T) -> (B, C, chunk, n_chunks) with 50% overlap."""
    B, C, T = x.shape
    hop = chunk // 2
    n_chunks = -(-max(T - chunk, 0) // hop) + 1
    Tp = (n_chunks - 1) * hop + chunk
    x = jnp.pad(x, [(0, 0), (0, 0), (0, Tp - T)])
    idx = np.arange(n_chunks)[:, None] * hop + np.arange(chunk)[None, :]
    seg = x[:, :, idx]  # (B, C, n_chunks, chunk)
    return jnp.swapaxes(seg, -1, -2), T  # (B, C, chunk, n_chunks)


def _overlap_add(seg, T: int):
    """(B, C, chunk, n_chunks) -> (B, C, T)."""
    B, C, chunk, n_chunks = seg.shape
    hop = chunk // 2
    Tp = (n_chunks - 1) * hop + chunk
    idx = np.arange(n_chunks)[:, None] * hop + np.arange(chunk)[None, :]
    flat_idx = jnp.asarray(idx.reshape(-1))
    out = jnp.zeros((B, C, Tp), seg.dtype)
    vals = jnp.swapaxes(seg, -1, -2).reshape(B, C, -1)
    out = out.at[:, :, flat_idx].add(vals)
    return out[:, :, :T]


class DPTNet(nn.Module):
    n_src: int = 1
    in_chan: int = 64
    out_chan: int = 64
    chunk_size: int = 100
    n_repeats: int = 2
    kernel_size: int = 16
    n_filters: int = 64
    stride: int = 8
    n_heads: int = 4
    dim_ff: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, T) or (B, 1, T) -> same-shape estimate."""
        squeeze_ch = x.ndim == 3
        if squeeze_ch:
            x = x[:, 0, :]
        T_in = x.shape[-1]
        pad = (-(T_in - self.kernel_size)) % self.stride
        xp = jnp.pad(x, [(0, 0), (0, pad)])[:, :, None]  # (B, T, 1)
        w = nn.Conv(self.n_filters, (self.kernel_size,), strides=(self.stride,),
                    padding="VALID", name="encoder")(xp)  # (B, frames, F)
        w = jax.nn.relu(w)
        tf = jnp.swapaxes(w, 1, 2)  # (B, F, frames)
        h = GlobLN(name="bottleneck_norm")(tf)
        seg, n_frames = _segment(h, self.chunk_size)  # (B, C, chunk, K)
        B, C, chunk, K = seg.shape

        for r in range(self.n_repeats):
            # intra-chunk: sequence = chunk dim
            s = jnp.transpose(seg, (2, 0, 3, 1)).reshape(chunk, B * K, C)
            s = ImprovedTransformerLayer(
                C, self.dim_ff, self.n_heads, name=f"intra_{r}"
            )(s, train)
            seg = jnp.transpose(s.reshape(chunk, B, K, C), (1, 3, 0, 2))
            # inter-chunk: sequence = chunk index
            s = jnp.transpose(seg, (3, 0, 2, 1)).reshape(K, B * chunk, C)
            s = ImprovedTransformerLayer(
                C, self.dim_ff, self.n_heads, name=f"inter_{r}"
            )(s, train)
            seg = jnp.transpose(s.reshape(K, B, chunk, C), (1, 3, 2, 0))

        from remfx_tpu.models.tcn import PReLU

        seg = PReLU(1, name="first_out_prelu")(seg)
        # 1x1 conv over channel dim to n_src * out_chan
        seg = jnp.einsum(
            "bckn,cd->bdkn",
            seg,
            self.param("mask_conv", nn.initializers.lecun_normal(),
                       (C, self.n_src * self.out_chan)),
        )
        mask = _overlap_add(seg, n_frames)  # (B, out_chan, frames)
        mask = jax.nn.sigmoid(mask)
        masked = tf * mask
        # decoder: transposed conv back to waveform
        md = jnp.swapaxes(masked, 1, 2)  # (B, frames, F)
        y = nn.ConvTranspose(1, (self.kernel_size,), strides=(self.stride,),
                             padding="VALID", name="decoder")(md)[:, :, 0]
        y = y[:, :T_in]
        if y.shape[-1] < T_in:
            y = jnp.pad(y, [(0, 0), (0, T_in - y.shape[-1])])
        return y[:, None, :] if squeeze_ch else y
