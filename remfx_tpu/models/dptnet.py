"""DPTNet — dual-path transformer on a learned filterbank,
asteroid-isomorphic.

Parity target: the reference's ``DPTNetModel`` (remfx/models.py:327-344)
wrapping ``asteroid.models.dptnet.DPTNet(n_src=1, in/out_chan=64,
chunk_size=100, n_repeats=2, fb_name="free", kernel_size=16,
n_filters=64, stride=8)`` — "Dual-Path Transformer Network" (Chen et
al., 2020). No published RemFX checkpoint uses DPTNet (capability
parity only), but the state-dict naming follows asteroid so trained
torch weights convert (compat.convert_dptnet, MAPPING.md).

Structure (asteroid DPTransformer):
  * free-filterbank encoder: Conv1d 1->64 k16 s8, no bias, ReLU
    (``encoder.filterbank._filters``);
  * GlobLN input norm (params gamma/beta);
  * DualPathProcessing: chunk unfold with padding=chunk_size and
    stride=chunk//2; n_repeats x [intra-chunk transformer, inter-chunk
    transformer]; fold back with the same padding, divided by the
    overlap factor chunk/hop;
  * each ImprovedTransformedLayer: torch-layout MultiheadAttention
    (in_proj_weight (3C, C), out_proj) + residual + GlobLN, then
    BiLSTM(ff_hid) -> activation -> Linear -> residual + GlobLN.
    NOTE (MAPPING.md): asteroid feeds its (batch, seq, C) tensor to a
    seq-first nn.LSTM — which axis carries the recurrence there could
    not be verified offline; this implementation recurs over the
    sequence axis (the paper's semantics).
  * head: PReLU + 1x1 Conv2d (``first_out``), fold, Tanh-gate x
    Sigmoid-gate (``net_out``/``net_gate``), ReLU mask; mask applied to
    the encoder representation; free-filterbank transposed-conv decoder.

All torch-layout parameters are kept verbatim (names weight/bias,
shapes untransposed) so the converter is a pure re-rooting, like UMX.

TPU-first: chunking via gather-free shifted reshapes, MHA/LSTM batched
over (chunks x batch) on the MXU, fold as K strided adds.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from remfx_tpu.models.lstm import LSTM


class GlobLN(nn.Module):
    """asteroid gLN: normalize over (channel, time) per example;
    params gamma/beta shaped (C,) (torch-verbatim)."""

    @nn.compact
    def __call__(self, x):
        # x: (B, C, T)
        g = self.param("gamma", nn.initializers.ones, (x.shape[1],))
        b = self.param("beta", nn.initializers.zeros, (x.shape[1],))
        m = jnp.mean(x, axis=(1, 2), keepdims=True)
        v = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - m) / jnp.sqrt(v + 1e-8) * g[None, :, None] + b[None, :, None]


class TorchMHA(nn.Module):
    """nn.MultiheadAttention with torch parameter layout:
    in_proj_weight (3C, C), in_proj_bias (3C,), out_proj.weight (C, C),
    out_proj.bias (C,). Input (S, B, C) sequence-first."""

    dim: int
    n_heads: int = 4

    @nn.compact
    def __call__(self, x):
        C, h = self.dim, self.n_heads
        d = C // h
        w_in = self.param("in_proj_weight",
                          nn.initializers.xavier_uniform(), (3 * C, C))
        b_in = self.param("in_proj_bias", nn.initializers.zeros, (3 * C,))
        w_out = self.param("out_proj_weight",
                           nn.initializers.xavier_uniform(), (C, C))
        b_out = self.param("out_proj_bias", nn.initializers.zeros, (C,))
        S, B, _ = x.shape
        qkv = jnp.einsum("sbc,dc->sbd", x, w_in) + b_in
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # float() keeps the scalar weakly typed: a np.float64 scalar
        # would promote bf16 activations to f32 for the whole layer
        q = q.reshape(S, B, h, d) / float(np.sqrt(d))
        k = k.reshape(S, B, h, d)
        v = v.reshape(S, B, h, d)
        att = jax.nn.softmax(jnp.einsum("sbhd,tbhd->bhst", q, k), axis=-1)
        out = jnp.einsum("bhst,tbhd->sbhd", att, v).reshape(S, B, C)
        return jnp.einsum("sbc,dc->sbd", out, w_out) + b_out


class ImprovedTransformerLayer(nn.Module):
    """DPTNet layer: MHA + residual + gLN, then (Bi)LSTM FF + residual
    + gLN (asteroid ImprovedTransformedLayer naming: mha, recurrent,
    linear, norm_mha, norm_ff)."""

    dim: int
    dim_ff: int = 256
    n_heads: int = 4
    bidirectional: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (S, B, C) sequence-first
        h = TorchMHA(self.dim, self.n_heads, name="mha")(x)
        # norms operate channels-first (B, C, S)
        y = jnp.transpose(x + h, (1, 2, 0))
        y = GlobLN(name="norm_mha")(y)
        x = jnp.transpose(y, (2, 0, 1))
        ff = LSTM(self.dim_ff, bidirectional=self.bidirectional,
                  name="recurrent")(x, train)
        ff = jax.nn.relu(ff)
        w = self.param("linear_weight", nn.initializers.xavier_uniform(),
                       (self.dim,
                        2 * self.dim_ff if self.bidirectional else self.dim_ff))
        b = self.param("linear_bias", nn.initializers.zeros, (self.dim,))
        ff = jnp.einsum("sbf,cf->sbc", ff, w) + b
        y = jnp.transpose(x + ff, (1, 2, 0))
        y = GlobLN(name="norm_ff")(y)
        return jnp.transpose(y, (2, 0, 1))


def _unfold(x, chunk: int, hop: int):
    """asteroid DualPathProcessing.unfold: (B, C, T) ->
    (B, C, chunk, n_chunks) with PADDING = chunk on both sides."""
    B, C, T = x.shape
    xp = jnp.pad(x, [(0, 0), (0, 0), (chunk, chunk)])
    Tp = T + 2 * chunk
    n_chunks = (Tp - chunk) // hop + 1
    idx = np.arange(n_chunks)[:, None] * hop + np.arange(chunk)[None, :]
    seg = xp[:, :, idx]  # (B, C, n_chunks, chunk)
    return jnp.swapaxes(seg, -1, -2)


def _fold(seg, T: int, hop: int):
    """Inverse of _unfold (F.fold with the same padding), divided by
    the constant overlap factor chunk/hop."""
    B, C, chunk, n_chunks = seg.shape
    Tp = T + 2 * chunk
    idx = np.arange(n_chunks)[:, None] * hop + np.arange(chunk)[None, :]
    out = jnp.zeros((B, C, Tp), seg.dtype)
    vals = jnp.swapaxes(seg, -1, -2)  # (B, C, n_chunks, chunk)
    out = out.at[:, :, idx.reshape(-1)].add(vals.reshape(B, C, -1))
    return out[:, :, chunk : chunk + T] / (chunk / hop)


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
    bidirectional: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, T) or (B, 1, T) -> same-shape estimate."""
        squeeze_ch = x.ndim == 3
        if squeeze_ch:
            x = x[:, 0, :]
        T_in = x.shape[-1]
        K, S = self.kernel_size, self.stride
        if T_in < K:
            x = jnp.pad(x, [(0, 0), (0, K - T_in)])
        # free filterbank encoder (torch _filters (n_filters, 1, K))
        filt = self.param(
            "encoder_filters",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (self.n_filters, 1, K),
        )
        w = jax.lax.conv_general_dilated(
            x[:, None, :], filt.astype(x.dtype), window_strides=(S,),
            padding=[(0, 0)], dimension_numbers=("NCH", "OIH", "NCH"),
        )  # (B, F, frames)
        tf = jax.nn.relu(w)  # encoder_activation="relu"
        n_frames = tf.shape[-1]

        h = GlobLN(name="in_norm")(tf)
        hop = self.chunk_size // 2
        seg = _unfold(h, self.chunk_size, hop)  # (B, C, chunk, Kc)
        B, C, chunk, Kc = seg.shape

        for r in range(self.n_repeats):
            # intra-chunk: sequence = position within chunk
            s = jnp.transpose(seg, (2, 0, 3, 1)).reshape(chunk, B * Kc, C)
            s = ImprovedTransformerLayer(
                C, self.dim_ff, self.n_heads, True, name=f"layers_{r}_intra"
            )(s, train)
            seg = jnp.transpose(s.reshape(chunk, B, Kc, C), (1, 3, 0, 2))
            # inter-chunk: sequence = chunk index
            s = jnp.transpose(seg, (3, 0, 2, 1)).reshape(Kc, B * chunk, C)
            s = ImprovedTransformerLayer(
                C, self.dim_ff, self.n_heads, self.bidirectional,
                name=f"layers_{r}_inter"
            )(s, train)
            seg = jnp.transpose(s.reshape(Kc, B, chunk, C), (1, 3, 2, 0))

        # head: PReLU + 1x1 Conv2d (torch weight (out, in, 1, 1))
        alpha = self.param("first_out_prelu", nn.initializers.constant(0.25),
                           (1,))
        seg = jnp.where(seg >= 0, seg, alpha[0] * seg)
        w1 = self.param(
            "first_out_weight", nn.initializers.variance_scaling(
                1.0, "fan_in", "normal"),
            (self.n_src * self.in_chan, C, 1, 1),
        )
        b1 = self.param("first_out_bias", nn.initializers.zeros,
                        (self.n_src * self.in_chan,))
        seg = jnp.einsum("bckn,dc->bdkn", seg, w1[..., 0, 0]) + b1[
            None, :, None, None]

        folded = _fold(seg, n_frames, hop)  # (B, n_src*C, frames)
        folded = folded.reshape(B * self.n_src, self.in_chan, n_frames)
        wo = self.param("net_out_weight",
                        nn.initializers.variance_scaling(1.0, "fan_in",
                                                         "normal"),
                        (self.in_chan, self.in_chan, 1))
        bo = self.param("net_out_bias", nn.initializers.zeros,
                        (self.in_chan,))
        wg = self.param("net_gate_weight",
                        nn.initializers.variance_scaling(1.0, "fan_in",
                                                         "normal"),
                        (self.in_chan, self.in_chan, 1))
        bg = self.param("net_gate_bias", nn.initializers.zeros,
                        (self.in_chan,))
        out = jnp.tanh(
            jnp.einsum("bcn,dc->bdn", folded, wo[..., 0]) + bo[None, :, None]
        ) * jax.nn.sigmoid(
            jnp.einsum("bcn,dc->bdn", folded, wg[..., 0]) + bg[None, :, None]
        )
        mask = jax.nn.relu(out).reshape(B, self.n_src, self.in_chan, n_frames)

        masked = tf * mask[:, 0]  # n_src = 1
        # free filterbank decoder: transposed conv with decoder filters
        dfilt = self.param(
            "decoder_filters",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (self.n_filters, 1, K),
        )
        from remfx_tpu.ops.subpixel import subpixel_conv_transpose

        kern = jnp.transpose(dfilt, (2, 0, 1))  # (K, F, 1), torch tap order
        # subpixel applies the spatially flipped kernel; pre-flip once for
        # torch ConvTranspose (scatter) semantics
        y = subpixel_conv_transpose(
            jnp.swapaxes(masked, 1, 2)[:, :, None, :],
            kern[::-1][:, None, :, :].astype(masked.dtype), (S, 1),
        )[:, :, 0, 0]
        # pad_x_to_y: crop/pad the tail to the input length
        if y.shape[-1] >= T_in:
            y = y[:, :T_in]
        else:
            y = jnp.pad(y, [(0, 0), (0, T_in - y.shape[-1])])
        return y[:, None, :] if squeeze_ch else y
