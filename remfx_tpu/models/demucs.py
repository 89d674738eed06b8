"""HDemucs — hybrid time + spectrogram U-Net, torchaudio-isomorphic.

Parity target: the reference's ``DemucsModel`` (remfx/models.py:307-324)
wrapping ``torchaudio.models.HDemucs(sources=["mixture"],
audio_channels=1, nfft=4096, channels=48)`` — the torchaudio port of
Demucs v3 (Défossez, "Hybrid Spectrogram and Waveform Source
Separation", 2021).

This module is parameter-isomorphic to the torch implementation: every
torch state-dict entry has exactly one flax param (see
``compat/MAPPING.md`` and ``compat.torch_import.convert_demucs``).
Structure (defaults: depth=6, kernel 8, stride 4, growth 2):

* freq (z) branch: normalized STFT (nfft 4096, hop 1024, demucs' 3*hop/2
  reflect pre-pad + frame trim), complex-as-channels; encoder layers
  0-4 convolve the frequency axis (k8 s4 pad2; layer 4 has k=freqs=8,
  pad 0, collapsing F to 1), layer 5 convolves time (k4 s2); a learned
  ``_ScaledEmbedding`` frequency embedding (scale 10, smooth init) is
  added after layer 0 with weight 0.2.
* time (t) branch: 5 conv1d encoder layers (k8 s4 pad2, total stride
  4^5 == hop); the 5th is "empty" (conv only) and its output is
  *injected* into freq layer 4's conv output.
* each non-empty layer: conv -> [GroupNorm(4) for layers >= 4] -> GELU
  -> _DConv residual branch -> 1x1 "rewrite" conv -> GLU.
* _DConv (encoders only): 2 residual blocks [conv k3 dil 2^d ->
  GroupNorm(1) -> GELU -> (BLSTM(2 layers, frames of 200) and
  LocalState attention for layers >= 4) -> 1x1 to 2C -> GroupNorm(1) ->
  GLU -> LayerScale(init 1e-4)].
* decoders mirror with skip sums, 3x3 (freq) / k3 (time) context
  rewrites + GLU, and transposed convs; freq output is masked onto the
  input STFT (CaC: direct re/im prediction, de-normalized), iSTFT'd,
  and summed with the time-branch waveform.

TPU-first implementation notes: features-last layouts; the strided
convs/transposed convs route through ops/fastconv + ops/subpixel (exact
math, backend-friendly backwards, PERF_NOTES #10); the DConv on freq
layers folds F into the batch exactly like the torch code; all shape
bookkeeping is static under jit.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from remfx_tpu.models.lstm import LSTM
from remfx_tpu.ops.fastconv import FastConv1d, strided_conv2d
from remfx_tpu.ops.stft import istft_ri, stft_ri
from remfx_tpu.ops.subpixel import subpixel_conv_transpose


def _gelu(x):
    # torch F.gelu is the exact erf form (jax.nn.gelu defaults to tanh)
    return jax.nn.gelu(x, approximate=False)


class ScaledEmbedding(nn.Module):
    """torch ``_ScaledEmbedding``: Embedding whose stored weight is
    divided by ``scale`` (and smoothed by a cumsum at init) and
    multiplied back at lookup — boosts the embedding's effective LR."""

    num_embeddings: int
    features: int
    scale: float = 10.0
    smooth: bool = True

    def _init(self, key):
        w = jax.random.normal(key, (self.num_embeddings, self.features))
        if self.smooth:
            w = jnp.cumsum(w, axis=0) / jnp.sqrt(
                jnp.arange(1, self.num_embeddings + 1, dtype=jnp.float32)
            )[:, None]
        return w / self.scale

    @nn.compact
    def __call__(self):
        w = self.param("weight", self._init)
        return w * self.scale


class BLSTM(nn.Module):
    """demucs ``BLSTM``: 2-layer BiLSTM + Linear, applied on overlapping
    frames of ``max_steps`` (stride max_steps//2) and re-stitched by
    keeping each frame's central part; residual skip."""

    dim: int
    layers: int = 2
    max_steps: int = 200
    skip: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, T, C)
        B, T, C = x.shape
        y = x
        framed = False
        if self.max_steps is not None and T > self.max_steps:
            width = self.max_steps
            stride = width // 2
            nframes = -(-T // stride)  # ceil
            tgt = (nframes - 1) * stride + width
            xp = jnp.pad(x, [(0, 0), (0, tgt - T), (0, 0)])
            idx = (
                np.arange(nframes)[:, None] * stride + np.arange(width)[None, :]
            )
            x = xp[:, idx, :].reshape(B * nframes, width, C)
            framed = True
        s = jnp.swapaxes(x, 0, 1)  # (T', B', C)
        s = LSTM(self.dim, num_layers=self.layers, bidirectional=True,
                 name="lstm")(s, train)
        s = nn.Dense(self.dim, name="linear")(s)
        x = jnp.swapaxes(s, 0, 1)  # (B', T', C)
        if framed:
            frames = x.reshape(B, nframes, width, C)
            limit = stride // 2
            out = [frames[:, 0, :-limit]]
            for k in range(1, nframes - 1):
                out.append(frames[:, k, limit:-limit])
            if nframes > 1:
                out.append(frames[:, nframes - 1, limit:])
            x = jnp.concatenate(out, axis=1)[:, :T]
        if self.skip:
            x = x + y
        return x


class LocalState(nn.Module):
    """demucs ``LocalState``: local attention with learned per-head decay
    envelopes; self-position masked; residual via a 1x1 projection."""

    channels: int
    heads: int = 4
    ndecay: int = 4

    @nn.compact
    def __call__(self, x):
        # x: (B, T, C)
        B, T, C = x.shape
        h = self.heads
        d = C // h
        q = nn.Dense(C, name="query")(x).reshape(B, T, h, d)
        k = nn.Dense(C, name="key")(x).reshape(B, T, h, d)
        # dots[b,h,t,s]: key position t vs query position s
        dots = jnp.einsum("bthd,bshd->bhts", k, q) / math.sqrt(d)
        if self.ndecay:
            decays = jnp.arange(1, self.ndecay + 1, dtype=x.dtype)
            # torch init: weight *= 0.01, bias = -2 (slow-opening gates)
            dq = nn.Dense(
                h * self.ndecay,
                kernel_init=nn.initializers.variance_scaling(
                    0.0001, "fan_in", "truncated_normal"
                ),
                bias_init=nn.initializers.constant(-2.0),
                name="query_decay",
            )(x)
            dq = jax.nn.sigmoid(dq.reshape(B, T, h, self.ndecay)) / 2
            delta = jnp.abs(
                jnp.arange(T, dtype=x.dtype)[:, None]
                - jnp.arange(T, dtype=x.dtype)[None, :]
            )
            kernel = -decays[:, None, None] * delta[None] / math.sqrt(self.ndecay)
            dots = dots + jnp.einsum("fts,bshf->bhts", kernel, dq)
        eye = jnp.eye(T, dtype=bool)[None, None]
        dots = jnp.where(eye, -100.0, dots)
        weights = jax.nn.softmax(dots, axis=2)
        content = nn.Dense(C, name="content")(x).reshape(B, T, h, d)
        result = jnp.einsum("bhts,bthd->bshd", weights, content)
        result = result.reshape(B, T, C)
        return x + nn.Dense(C, name="proj")(result)


class DConv(nn.Module):
    """demucs ``DConv`` residual branch (see module docstring).

    Param names mirror the torch Sequential composition; the converter
    maps the numeric Sequential indices to these roles."""

    channels: int
    compress: float = 4.0
    depth: int = 2
    init: float = 1e-4
    attn: bool = False
    lstm: bool = False
    heads: int = 4
    ndecay: int = 4
    kernel: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, T, C)
        hidden = int(self.channels / self.compress)
        for d in range(self.depth):
            dilation = 2**d
            pad = dilation * (self.kernel // 2)
            h = nn.Conv(hidden, (self.kernel,), kernel_dilation=(dilation,),
                        padding=[(pad, pad)], name=f"layers{d}_conv1")(x)
            h = nn.GroupNorm(num_groups=1, epsilon=1e-5, name=f"layers{d}_norm1")(h)
            h = _gelu(h)
            if self.lstm:
                h = BLSTM(hidden, name=f"layers{d}_lstm")(h, train)
            if self.attn:
                h = LocalState(hidden, self.heads, self.ndecay,
                               name=f"layers{d}_attn")(h)
            h = nn.Conv(2 * self.channels, (1,), name=f"layers{d}_conv2")(h)
            h = nn.GroupNorm(num_groups=1, epsilon=1e-5, name=f"layers{d}_norm2")(h)
            h = nn.glu(h, axis=-1)
            scale = self.param(
                f"layers{d}_scale",
                lambda _k: jnp.full((self.channels,), self.init),
            )
            x = x + scale * h
        return x


def _conv_transpose_1d(x, kern, bias, stride):
    """torch ConvTranspose1d semantics; kern (k, in, out) in torch's tap
    order (flipped before the subpixel adjoint-correlation)."""
    y = subpixel_conv_transpose(
        x[:, :, None, :], kern[::-1][:, None, :, :].astype(x.dtype),
        (stride, 1),
    )[:, :, 0, :]
    return y + bias.astype(y.dtype)


def _conv_transpose_freq(x, kern, bias, stride):
    """torch ConvTranspose2d with kernel (k, 1): x (B, F, T, C)."""
    y = subpixel_conv_transpose(
        x, kern[::-1][:, None, :, :].astype(x.dtype), (stride, 1)
    )
    return y + bias.astype(y.dtype)


class FreqConv(nn.Module):
    """Strided conv over the frequency axis of (B, F, T, C); params named
    like nn.Conv (kernel (k, 1, cin, cout), bias) for the converter."""

    features: int
    kernel_size: int
    stride: int
    pad: int

    @nn.compact
    def __call__(self, x):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, 1, x.shape[-1], self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        y = strided_conv2d(
            x, k.astype(x.dtype), (self.stride, 1),
            ((self.pad, self.pad), (0, 0)),
        )
        return y + b.astype(y.dtype)


class HEncLayer(nn.Module):
    """demucs ``HEncLayer``. freq=True: conv over the frequency axis of a
    (B, F, T, C) image; else conv1d over (B, T, C). ``empty``: conv only
    (the time branch's inject layer)."""

    chout: int
    kernel_size: int = 8
    stride: int = 4
    freq: bool = True
    empty: bool = False
    norm: bool = False
    pad: bool = True
    norm_groups: int = 4
    context: int = 0  # context_enc: rewrite kernel = 1 + 2*context
    dconv_lstm: bool = False
    dconv_attn: bool = False

    @nn.compact
    def __call__(self, x, inject=None, train: bool = False):
        pad = self.kernel_size // 4 if self.pad else 0
        if self.freq:
            if x.ndim == 3:
                # (B, T, C) -> (B, F=1, T, C)
                x = x[:, None, :, :]
            y = FreqConv(self.chout, self.kernel_size, self.stride, pad,
                         name="conv")(x)
        else:
            if x.ndim == 4:
                # (B, F, T, C) -> (B, T, F*C) in torch's (C, F) order
                B, F, T, C = x.shape
                x = jnp.transpose(x, (0, 2, 3, 1)).reshape(B, T, C * F)
            le = x.shape[1]
            if le % self.stride != 0:
                x = jnp.pad(
                    x, [(0, 0), (0, self.stride - le % self.stride), (0, 0)]
                )
            y = FastConv1d(self.chout, self.kernel_size, self.stride,
                           (pad, pad), name="conv")(x)
        if self.empty:
            return y
        if inject is not None:
            if inject.ndim == 3 and y.ndim == 4:
                inject = inject[:, None, :, :]
            y = y + inject
        if self.norm:
            y = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-5, name="norm1")(y)
        y = _gelu(y)
        # DConv over time with freq folded into batch (torch permute)
        if self.freq:
            B, F, T, C = y.shape
            h = y.reshape(B * F, T, C)
        else:
            h = y
        h = DConv(self.chout, lstm=self.dconv_lstm, attn=self.dconv_attn,
                  name="dconv")(h, train)
        y = h.reshape(y.shape) if self.freq else h
        kr = 1 + 2 * self.context
        if self.freq:
            z = nn.Conv(2 * self.chout, (kr, kr),
                        padding=[(self.context,) * 2] * 2, name="rewrite")(y)
        else:
            z = nn.Conv(2 * self.chout, (kr,),
                        padding=[(self.context,) * 2], name="rewrite")(y)
        if self.norm:
            z = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-5, name="norm2")(z)
        return nn.glu(z, axis=-1)


class HDecLayer(nn.Module):
    """demucs ``HDecLayer``: skip sum -> context rewrite + GLU ->
    transposed conv -> crop; returns (z, pre) like the torch code (pre
    feeds the empty time decoder)."""

    chout: int
    kernel_size: int = 8
    stride: int = 4
    freq: bool = True
    empty: bool = False
    norm: bool = False
    pad: bool = True
    norm_groups: int = 4
    context: int = 1
    last: bool = False
    # identity-start training (HDemucs.zero_final): zero the OUTPUT
    # conv so the decoder contributes nothing at step 0; the wrapper's
    # residual skip then makes the whole model an exact passthrough.
    # Structure (and thus torch weight-compat) is unchanged.
    zero_init: bool = False

    @nn.compact
    def __call__(self, x, skip, length, train: bool = False):
        pad = self.kernel_size // 4 if self.pad else 0
        if self.freq and x.ndim == 3:
            x = x[:, None, :, :]  # (B, F=1, T, C)
        if not self.empty:
            x = x + skip
            kr = 1 + 2 * self.context
            if self.freq:
                z = nn.Conv(2 * x.shape[-1], (kr, kr),
                            padding=[(self.context,) * 2] * 2,
                            name="rewrite")(x)
            else:
                z = nn.Conv(2 * x.shape[-1], (kr,),
                            padding=[(self.context,) * 2], name="rewrite")(x)
            if self.norm:
                z = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-5, name="norm1")(z)
            y = nn.glu(z, axis=-1)
        else:
            y = x
        cin = y.shape[-1]
        kern_init = (nn.initializers.zeros if self.zero_init
                     else nn.initializers.lecun_normal())
        kern = self.param("conv_tr_kernel", kern_init,
                          (self.kernel_size, cin, self.chout))
        kb = self.param("conv_tr_bias", nn.initializers.zeros, (self.chout,))
        if self.freq:
            z = _conv_transpose_freq(y, kern, kb, self.stride)
            if self.norm:
                z = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-5, name="norm2")(z)
            if pad:
                z = z[:, pad:-pad, :, :]
        else:
            z = _conv_transpose_1d(y, kern, kb, self.stride)
            if self.norm:
                z = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-5, name="norm2")(z)
            z = z[:, pad : pad + length, :]
        if not self.last:
            z = _gelu(z)
        return z, y


def _layer_plan(nfft: int, depth: int, channels: int, audio_channels: int,
                n_sources: int = 1,
                growth: float = 2.0, kernel_size: int = 8, stride: int = 4,
                time_stride: int = 2, norm_starts: int = 4,
                dconv_lstm: int = 4, dconv_attn: int = 4):
    """Reproduce the torch constructor's per-index layer configuration."""
    plan = []
    freqs = nfft // 2
    chin, chin_z = audio_channels, audio_channels * 2
    chout = chout_z = channels
    emb_dim = None
    emb_freqs = None
    for index in range(depth):
        freq = freqs > 1
        stri, ker, pad, last_freq = stride, kernel_size, True, False
        if not freq:
            ker, stri = time_stride * 2, time_stride
        if freq and freqs <= kernel_size:
            ker, pad, last_freq = freqs, False, True
        plan.append(dict(
            index=index, freq=freq, last_freq=last_freq,
            kernel=ker, stride=stri, pad=pad,
            norm=index >= norm_starts,
            lstm=index >= dconv_lstm, attn=index >= dconv_attn,
            chin=chin, chin_z=chin_z, chout=chout, chout_z=chout_z,
            # decoder output channels (chin/chin_z get reset after idx 0)
            dec_out=chin, dec_out_z=chin_z,
        ))
        if index == 0:
            # decoder 0 outputs sources * audio channels (cac: *2)
            plan[0]["dec_out"] = audio_channels * n_sources
            plan[0]["dec_out_z"] = audio_channels * n_sources * 2
            emb_freqs = freqs // stride
            emb_dim = chout_z
        chin, chin_z = chout, chout_z
        chout, chout_z = int(growth * chout), int(growth * chout_z)
        if freq:
            freqs = 1 if freqs <= kernel_size else freqs // stride
    return plan, emb_freqs, emb_dim


class HDemucs(nn.Module):
    """torchaudio-compatible HDemucs (see module docstring).

    ``depth`` is the total encoder depth (torch default 6: 5 freq layers
    + 1 time layer for nfft 4096). ``sources``/``audio_channels`` follow
    the torch surface; output is (B, len(sources)*audio_channels, T).
    """

    sources: tuple = ("mixture",)
    audio_channels: int = 1
    channels: int = 48
    nfft: int = 4096
    depth: int = 6
    growth: float = 2.0
    freq_emb_scale: float = 0.2
    norm_starts: int = 4
    dconv_lstm: int = 4
    dconv_attn: int = 4
    # zero-init the two final (last=True) decoder output convs so the
    # network's contribution is ~0 at init (the denorm adds only the
    # batch-mean). Pairs with ModelWrapper.residual for identity-start
    # training; False (torch-equivalent init) for weight-compat loads.
    zero_final: bool = False

    # ---- spectral helpers (demucs _spec/_ispec/_magnitude/_mask) ----

    def _window(self):
        n = np.arange(self.nfft)
        return jnp.asarray(
            (0.5 * (1.0 - np.cos(2.0 * np.pi * n / self.nfft))).astype(
                np.float32
            )
        )

    def _spec(self, x):
        """x (B, C, T) -> (re, im) each (B, C, nfft//2, le) — demucs
        _spec: 3*hop/2 reflect pre-pad, normalized torch.stft, Nyquist
        drop, frame trim [2:2+le]."""
        hop = self.nfft // 4
        T = x.shape[-1]
        le = -(-T // hop)
        pad = hop // 2 * 3
        # demucs pad1d: when the signal is shorter than the reflect pad,
        # zero-extend and take the extension OUT of the reflect paddings
        # (total padded length is unchanged)
        left, right = pad, pad + le * hop - T
        if T <= max(left, right):
            extra = max(left, right) - T + 1
            extra_right = min(right, extra)
            extra_left = extra - extra_right
            x = jnp.pad(x, [(0, 0), (0, 0), (extra_left, extra_right)])
            left, right = left - extra_left, right - extra_right
        x = jnp.pad(x, [(0, 0), (0, 0), (left, right)], mode="reflect")
        re, im = stft_ri(x, self.nfft, hop, self._window())
        scale = 1.0 / math.sqrt(self.nfft)  # torch.stft(normalized=True)
        re, im = re * scale, im * scale
        re, im = re[..., :-1, :], im[..., :-1, :]
        return re[..., 2 : 2 + le], im[..., 2 : 2 + le]

    def _ispec(self, re, im, length):
        """Inverse of _spec: Nyquist re-pad, frame re-pad (2, 2),
        normalized istft, crop [pad : pad+length]."""
        hop = self.nfft // 4
        re = jnp.pad(re, [(0, 0), (0, 0), (0, 1), (2, 2)])
        im = jnp.pad(im, [(0, 0), (0, 0), (0, 1), (2, 2)])
        pad = hop // 2 * 3
        le = hop * int(math.ceil(length / hop)) + 2 * pad
        scale = math.sqrt(self.nfft)
        x = istft_ri(re * scale, im * scale, self.nfft, hop, self._window(),
                     length=le)
        return x[..., pad : pad + length]

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, C, T) -> (B, len(sources)*C, T)."""
        B, C, T = x.shape
        S = len(self.sources)
        plan, emb_freqs, emb_dim = _layer_plan(
            self.nfft, self.depth, self.channels, self.audio_channels,
            n_sources=S, growth=self.growth, norm_starts=self.norm_starts,
            dconv_lstm=self.dconv_lstm, dconv_attn=self.dconv_attn,
        )
        n_freq_layers = sum(1 for p in plan if p["freq"])

        re, im = self._spec(x)  # (B, C, F, N)
        Fq, N = re.shape[-2], re.shape[-1]
        # CaC channels: (B, C, 2, F, N) -> (B, 2C, F, N) -> image layout
        mag = jnp.stack([re, im], axis=2).reshape(B, 2 * C, Fq, N)
        mean = jnp.mean(mag, axis=(1, 2, 3), keepdims=True)
        std = jnp.std(mag, axis=(1, 2, 3), keepdims=True, ddof=1)
        z = (mag - mean) / (1e-5 + std)
        z = jnp.transpose(z, (0, 2, 3, 1))  # (B, F, N, 2C)

        xt = jnp.swapaxes(x, 1, 2)  # (B, T, C)
        meant = jnp.mean(xt, axis=(1, 2), keepdims=True)
        stdt = jnp.std(xt, axis=(1, 2), keepdims=True, ddof=1)
        xt = (xt - meant) / (1e-5 + stdt)

        saved, saved_t, lengths, lengths_t = [], [], [], []
        for p in plan:
            i = p["index"]
            # torch lengths.append(x.shape[-1]): the TIME extent
            lengths.append(z.shape[2] if z.ndim == 4 else z.shape[1])
            inject = None
            if i < n_freq_layers:  # time branch runs alongside freq layers
                lengths_t.append(xt.shape[1])
                xt = HEncLayer(
                    p["chout"], kernel_size=8, stride=4, freq=False,
                    empty=p["last_freq"], norm=p["norm"],
                    dconv_lstm=p["lstm"], dconv_attn=p["attn"],
                    name=f"time_encoder_{i}",
                )(xt, train=train)
                if p["last_freq"]:
                    inject = xt
                else:
                    saved_t.append(xt)
            z = HEncLayer(
                p["chout_z"], kernel_size=p["kernel"], stride=p["stride"],
                freq=p["freq"], norm=p["norm"], pad=p["pad"],
                dconv_lstm=p["lstm"], dconv_attn=p["attn"],
                name=f"freq_encoder_{i}",
            )(z, inject=inject, train=train)
            if i == 0:
                emb = ScaledEmbedding(emb_freqs, emb_dim, name="freq_emb")()
                z = z + self.freq_emb_scale * emb[None, :, None, :]
            saved.append(z)

        # ---- decoders (torch ModuleList order: position 0 inverts the
        # deepest layer). The torch forward zeroes x before decoding —
        # the bottleneck output reaches the decoder through the first
        # skip sum only. ----
        z = jnp.zeros_like(z)
        xt_dec = None
        for pos in range(self.depth):
            p = plan[self.depth - 1 - pos]
            skip = saved.pop(-1)
            length = lengths.pop(-1)
            z, pre = HDecLayer(
                p["dec_out_z"], kernel_size=p["kernel"], stride=p["stride"],
                freq=p["freq"], norm=p["norm"], pad=p["pad"],
                last=p["index"] == 0, name=f"freq_decoder_{pos}",
                zero_init=self.zero_final and p["index"] == 0,
            )(z, skip, length, train=train)
            offset = self.depth - n_freq_layers
            if pos >= offset:
                tpos = pos - offset
                length_t = lengths_t.pop(-1)
                if p["last_freq"]:
                    # empty time decoder driven by `pre` (B, F=1, T, C)
                    pre_t = pre[:, 0, :, :]
                    xt_dec, _ = HDecLayer(
                        p["dec_out"], kernel_size=8, stride=4, freq=False,
                        empty=True, norm=p["norm"], last=False,
                        name=f"time_decoder_{tpos}",
                    )(pre_t, None, length_t, train=train)
                else:
                    skip_t = saved_t.pop(-1)
                    xt_dec, _ = HDecLayer(
                        p["dec_out"], kernel_size=8, stride=4, freq=False,
                        norm=p["norm"], last=p["index"] == 0,
                        name=f"time_decoder_{tpos}",
                        zero_init=self.zero_final and p["index"] == 0,
                    )(xt_dec, skip_t, length_t, train=train)

        # ---- spec output -> iSTFT ----
        zo = jnp.transpose(z, (0, 3, 1, 2))  # (B, S*2C, F, N)
        zo = zo * std + mean
        zo = zo.reshape(B, S, C, 2, Fq, N)
        re_o = zo[:, :, :, 0].reshape(B, S * C, Fq, N)
        im_o = zo[:, :, :, 1].reshape(B, S * C, Fq, N)
        wave_f = self._ispec(re_o, im_o, T)

        wave_t = jnp.swapaxes(xt_dec, 1, 2)[..., :T]  # (B, S*C, T)
        wave_t = wave_t * stdt.reshape(B, 1, 1) + meant.reshape(B, 1, 1)
        return wave_f + wave_t
