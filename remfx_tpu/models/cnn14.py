"""Cnn14 (PANNs) multi-label effect classifier.

Parity target: reference ``remfx/classifier.py:134-284`` — the in-repo
Cnn14 variant: optional resample -> torchaudio MelSpectrogram (n_fft
2048, hop 512, 128 mels for the shipped config) -> optional SpecAugment
(freq mask 64, time mask 128, train only) -> per-example
standardization -> 6 ConvBlocks (64..2048, each 2x[3x3 conv + BN +
ReLU] + 2x2 avg pool) -> mean over time, max+mean over mel -> fc 2048
-> 5 independent sigmoid heads.

Reference quirks preserved: ``bn0`` exists as a parameter but is never
applied in forward (classifier.py:163 vs 193-233); axis order follows
torchaudio's (B, 1, mel, time) so time is reduced first.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from remfx_tpu.ops.mel import MelSpectrogram
from remfx_tpu.ops.resample import resample


class ConvBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool, pool_size=(2, 2), pool_type="avg"):
        """x: (B, H, W, C) features-last."""
        x = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False, name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn2")(x)
        x = nn.relu(x)
        # clamp the window to the input so short clips never pool a
        # spatial dim to zero size (whose downstream mean is NaN); the
        # published 262144-sample config (512 frames) is unaffected
        pool_size = (min(pool_size[0], x.shape[1]),
                     min(pool_size[1], x.shape[2]))
        if pool_size != (1, 1):
            if pool_type == "avg":
                x = nn.avg_pool(x, pool_size, strides=pool_size)
            elif pool_type == "max":
                x = nn.max_pool(x, pool_size, strides=pool_size)
            elif pool_type == "avg+max":
                x = nn.avg_pool(x, pool_size, strides=pool_size) + nn.max_pool(
                    x, pool_size, strides=pool_size
                )
        return x


def _rand_mask(key, length, mask_param):
    """torchaudio-style mask: width ~ U[0, mask_param), start ~ U[0, len-width]."""
    k1, k2 = jax.random.split(key)
    width = jax.random.uniform(k1, (), minval=0.0, maxval=float(mask_param))
    start = jax.random.uniform(k2, (), minval=0.0, maxval=1.0) * (length - width)
    idx = jnp.arange(length, dtype=jnp.float32)
    return (idx >= start) & (idx < start + width)  # True = masked


class Cnn14(nn.Module):
    num_classes: int
    sample_rate: float
    model_sample_rate: float
    n_fft: int = 1024
    hop_length: int = 256
    n_mels: int = 128
    specaugment: bool = False
    freq_mask_param: int = 64
    time_mask_param: int = 128

    def setup(self):
        self.melspec = MelSpectrogram(
            self.model_sample_rate, self.n_fft, self.hop_length, self.n_mels
        )
        # reference quirk: bn0 exists but is unused in forward
        self.bn0 = nn.BatchNorm(use_running_average=True, name="bn0_unused")
        self.conv_block1 = ConvBlock(64)
        self.conv_block2 = ConvBlock(128)
        self.conv_block3 = ConvBlock(256)
        self.conv_block4 = ConvBlock(512)
        self.conv_block5 = ConvBlock(1024)
        self.conv_block6 = ConvBlock(2048)
        self.fc1 = nn.Dense(2048)
        self.heads = [nn.Dense(1, name=f"head{i}") for i in range(self.num_classes)]

    def __call__(self, x, train: bool = False):
        """x: (B, 1, T) or (B, T) -> (B, num_classes) sigmoid probs."""
        h = self.embed(x, train)
        outs = [jax.nn.sigmoid(head(h)) for head in self.heads]
        return jnp.concatenate(outs, axis=-1)  # (B, num_classes)

    def embed(self, x, train: bool = False):
        """PANNs scene embedding: the 2048-d post-fc1 ReLU features (the
        trunk the reference's frozen `PANNs` HEAR classifier consumes,
        remfx/classifier.py:16-38)."""
        if x.ndim == 3:
            x = x[:, 0, :]
        if self.sample_rate != self.model_sample_rate:
            x = resample(x, int(self.sample_rate), int(self.model_sample_rate))
        m = self.melspec(x)  # (B, mel, time)

        if self.specaugment and train:
            key = self.make_rng("specaugment")
            kf, kt = jax.random.split(key)
            B, n_mel, n_t = m.shape
            fmask = jax.vmap(lambda k: _rand_mask(k, n_mel, self.freq_mask_param))(
                jax.random.split(kf, B)
            )
            tmask = jax.vmap(lambda k: _rand_mask(k, n_t, self.time_mask_param))(
                jax.random.split(kt, B)
            )
            m = jnp.where(fmask[:, :, None], 0.0, m)
            m = jnp.where(tmask[:, None, :], 0.0, m)

        # per-example standardization over (mel, time) — ddof=1 like torch.std
        mean = jnp.mean(m, axis=(1, 2), keepdims=True)
        n = m.shape[1] * m.shape[2]
        var = jnp.sum((m - mean) ** 2, axis=(1, 2), keepdims=True) / (n - 1)
        # clamp: a fully-masked/silent clip has var 0 (NaN otherwise);
        # real spectrograms sit far above the floor, so this is a no-op
        # for the published config
        m = (m - mean) / jnp.maximum(jnp.sqrt(var), 1e-6)

        def drop(v, rate, idx):
            # functional dropout (setup-style modules can't create inline
            # nn.Dropout submodules)
            if not train:
                return v
            k = jax.random.fold_in(self.make_rng("dropout"), idx)
            keep = jax.random.bernoulli(k, 1.0 - rate, v.shape)
            return jnp.where(keep, v / (1.0 - rate), 0.0)

        h = m[:, :, :, None]  # (B, mel, time, 1) features-last
        h = drop(self.conv_block1(h, train, (2, 2), "avg"), 0.2, 0)
        h = drop(self.conv_block2(h, train, (2, 2), "avg"), 0.2, 1)
        h = drop(self.conv_block3(h, train, (2, 2), "avg"), 0.2, 2)
        h = drop(self.conv_block4(h, train, (2, 2), "avg"), 0.2, 3)
        h = drop(self.conv_block5(h, train, (2, 2), "avg"), 0.2, 4)
        h = drop(self.conv_block6(h, train, (1, 1), "avg"), 0.2, 5)
        # (B, mel', time', C): reduce time (mean), then mel (max+mean)
        h = jnp.mean(h, axis=2)  # (B, mel', C)
        h = jnp.max(h, axis=1) + jnp.mean(h, axis=1)  # (B, C)
        h = drop(h, 0.5, 6)
        h = nn.relu(self.fc1(h))
        return h
