"""OpenUnmix (UMX) — BiLSTM spectral masking + mixture-phase separator.

Parity target: the reference's ``OpenUnmixModel`` (remfx/models.py:259-304)
wrapping sigsep/open-unmix-pytorch's ``OpenUnmix`` + ``Separator``
(git submodule; architecture per upstream):

  OpenUnmix: crop bins -> (x+input_mean)*input_scale -> fc1(no bias) ->
  BN1d -> tanh -> 3-layer BiLSTM(hidden 512, bidir halves to 256) with
  skip concat -> fc2 -> BN -> ReLU -> fc3 -> BN -> *output_scale +
  output_mean -> ReLU -> mask * mix.

  Separator (niter=0, softmask=False, single target): STFT (n_fft 2048,
  hop 512) -> magnitude -> model -> wiener initial estimate = magnitude
  estimate with the *mixture phase* -> iSTFT at input length.

Reference quirks NOT replicated: the wrapper's discarded
``self.model(spectrogram(x))`` pass (models.py:294-297) only perturbs BN
running stats during training; we run the separator path once.

Weight-compat: parameter names/shapes mirror torch (fc*.weight (out,in),
bn*.{weight,bias,running_*}, lstm.weight_*_l{n}[_reverse]).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from remfx_tpu.models.lstm import LSTM
from remfx_tpu.ops.stft import istft_ri, stft_ri


class _Linear(nn.Module):
    """Dense with torch (out, in) kernel layout, for 1:1 weight import."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight",
            nn.initializers.lecun_normal(),
            (self.features, x.shape[-1]),
        )
        y = x @ w.T
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class _BatchNorm1d(nn.Module):
    """torch BatchNorm1d over the last axis (param names match torch)."""

    features: int
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable(
            "batch_stats", "running_mean", lambda: jnp.zeros((self.features,))
        )
        var = self.variable(
            "batch_stats", "running_var", lambda: jnp.ones((self.features,))
        )
        if train:
            axes = tuple(range(x.ndim - 1))
            m = jnp.mean(x, axes)
            v = jnp.var(x, axes)
            n = x.size / self.features
            if not self.is_initializing():
                mean.value = (1 - self.momentum) * mean.value + self.momentum * m
                var.value = (
                    (1 - self.momentum) * var.value
                    + self.momentum * v * n / max(n - 1, 1)
                )
        else:
            m, v = mean.value, var.value
        return (x - m) / jnp.sqrt(v + self.eps) * weight + bias


class OpenUnmix(nn.Module):
    nb_bins: int = 1025
    nb_channels: int = 1
    hidden_size: int = 512
    nb_layers: int = 3
    max_bin: int | None = None
    # near-identity start (training aid, not in upstream): init the
    # output affine so mask ~= 1 +- 0.1 and the model begins AT the
    # input baseline (a random mask costs ~5-10 dB SI-SDR that the
    # optimizer must first claw back); converted torch checkpoints
    # overwrite these params, so weight-import parity is unaffected
    identity_init: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, C, F, T) magnitude -> (B, C, F, T) masked magnitude."""
        B, C, F, T = x.shape
        nb_bins = self.max_bin or self.nb_bins
        mix = x
        h = jnp.transpose(x, (3, 0, 1, 2))[..., :nb_bins]  # (T, B, C, F')
        input_mean = self.param("input_mean", nn.initializers.zeros, (nb_bins,))
        input_scale = self.param("input_scale", nn.initializers.ones, (nb_bins,))
        h = (h + input_mean) * input_scale
        h = h.reshape(T * B, C * nb_bins)
        h = _Linear(self.hidden_size, use_bias=False, name="fc1")(h)
        h = _BatchNorm1d(self.hidden_size, name="bn1")(h, train)
        h = jnp.tanh(h).reshape(T, B, self.hidden_size)
        lstm_out = LSTM(
            self.hidden_size // 2,
            num_layers=self.nb_layers,
            bidirectional=True,
            dropout=0.4,
            name="lstm",
        )(h, train)
        h = jnp.concatenate([h, lstm_out], axis=-1)
        h = h.reshape(T * B, -1)
        h = _Linear(self.hidden_size, use_bias=False, name="fc2")(h)
        h = _BatchNorm1d(self.hidden_size, name="bn2")(h, train)
        h = jax.nn.relu(h)
        h = _Linear(self.nb_bins * C, use_bias=False, name="fc3")(h)
        h = _BatchNorm1d(self.nb_bins * C, name="bn3")(h, train)
        h = h.reshape(T, B, C, self.nb_bins)
        output_scale = self.param(
            "output_scale",
            nn.initializers.constant(0.1 if self.identity_init else 1.0),
            (self.nb_bins,),
        )
        output_mean = self.param(
            "output_mean",
            nn.initializers.constant(1.0 if self.identity_init else 0.0),
            (self.nb_bins,),
        )
        h = h * output_scale + output_mean
        mask = jax.nn.relu(jnp.transpose(h, (1, 2, 3, 0)))  # (B, C, F, T)
        return mask * mix


class UMXSeparator(nn.Module):
    """STFT -> OpenUnmix magnitude estimate -> wiener reconstruction -> iSTFT.

    ``niter=0`` (the upstream Separator default used by the reference,
    remfx/models.py:283-288: no ``niter`` passed) reconstructs with the
    mixture phase.  ``niter>0`` runs the norbert EM refinement
    (ops/wiener.py); as upstream, a single target then requires
    ``residual=True`` (the residual source is appended internally and
    dropped from the output).  ``softmask`` selects ratio-mask
    initialisation; ``wiener_win_len`` bounds per-window EM statistics.
    """

    n_fft: int = 2048
    hop_length: int = 512
    nb_channels: int = 1
    hidden_size: int = 512
    niter: int = 0
    softmask: bool = False
    residual: bool = False
    wiener_win_len: int | None = 300
    identity_init: bool = False

    def setup(self):
        self.model = OpenUnmix(
            nb_bins=self.n_fft // 2 + 1,
            nb_channels=self.nb_channels,
            hidden_size=self.hidden_size,
            identity_init=self.identity_init,
        )

    def __call__(self, audio, train: bool = False):
        """audio: (B, C, T) -> (B, C, T) estimate."""
        T = audio.shape[-1]
        n = np.arange(self.n_fft)
        window = jnp.asarray(
            (0.5 * (1.0 - np.cos(2.0 * np.pi * n / self.n_fft))).astype(np.float32)
        )
        re, im = stft_ri(audio, self.n_fft, self.hop_length, window)
        mag = jnp.sqrt(re * re + im * im)
        est = self.model(mag, train)  # (B, C, F, frames)
        if self.niter == 0 and not self.softmask:
            # fast path: magnitude estimate with the mixture phase
            denom = jnp.maximum(mag, 1e-8)
            yr = est * re / denom
            yi = est * im / denom
        else:
            from remfx_tpu.ops.wiener import wiener

            # (B, C, F, frames) -> per-example (frames, F, C, S=1)
            def one(est_b, re_b, im_b):
                tm = jnp.transpose(est_b, (2, 1, 0))[..., None]
                xr = jnp.transpose(re_b, (2, 1, 0))
                xi = jnp.transpose(im_b, (2, 1, 0))
                yr, yi = wiener(
                    tm, xr, xi,
                    niter=self.niter,
                    softmask=self.softmask,
                    residual=self.residual or self.niter > 0,
                    wiener_win_len=self.wiener_win_len,
                )
                # keep target source 0; back to (C, F, frames)
                return (
                    jnp.transpose(yr[..., 0], (2, 1, 0)),
                    jnp.transpose(yi[..., 0], (2, 1, 0)),
                )

            yr, yi = jax.vmap(one)(est, re, im)
        return istft_ri(yr, yi, self.n_fft, self.hop_length, window, length=T)
