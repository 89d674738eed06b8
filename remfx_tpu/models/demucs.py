"""HDemucs — hybrid time + spectrogram U-Net.

Parity target: the reference's ``DemucsModel`` (remfx/models.py:307-324)
wrapping ``torchaudio.models.HDemucs(sources=["mixture"],
audio_channels=1, nfft=4096, channels=48)`` (= Demucs v3, Défossez 2021).

Faithful structure implemented here:
  * spec branch: STFT (nfft 4096, hop 1024), complex-as-channels (CaC),
    last freq bin dropped; 5 encoder layers convolving the *frequency*
    axis (k8 s4) with a learned frequency embedding after layer 0;
  * time branch: 5 conv1d encoder layers (k8 s4) — total stride 4^5 =
    1024 samples == the STFT hop, so the branches align and merge by
    summation at the bottleneck;
  * shared bottleneck layer (k8 s4 over time) with a BiLSTM + local-attn
    style DConv residual; mirrored shared decoder; branch decoders with
    U-Net skips; spec output -> iSTFT; final output = spec wave + time
    wave (the hybrid sum).
  * per-layer structure: conv -> GELU -> DConv residual (2 dilated convs
    with GLU + layer-scale) -> 1x1 conv -> GLU; GroupNorm(4) on deep
    layers.

NOTE: this matches Demucs v3's architecture family and config surface;
exact torchaudio parameter-for-parameter compatibility could not be
verified offline (torchaudio absent; Zenodo ckpts unreachable) and is
tracked for the converter round, like DCUNet/DPTNet.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from remfx_tpu.models.lstm import LSTM
from remfx_tpu.ops.stft import istft_ri, stft_ri


class DConv(nn.Module):
    """Residual branch: 2 x [conv k3 dilated -> GroupNorm -> GELU ->
    1x1 to 2ch -> GLU -> LayerScale] (demucs v3 DConv, compress=4)."""

    channels: int
    compress: int = 4
    use_lstm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, T', C) features-last
        hidden = max(self.channels // self.compress, 4)
        for d in range(2):
            h = nn.Conv(hidden, (3,), kernel_dilation=(2**d,),
                        padding="SAME", name=f"conv{d}_a")(x)
            h = nn.GroupNorm(num_groups=1, name=f"norm{d}_a")(h)
            h = nn.gelu(h)
            if self.use_lstm and d == 0:
                s = jnp.swapaxes(h, 0, 1)  # (T', B, hidden)
                s = LSTM(hidden, bidirectional=True, name=f"lstm{d}")(s, train)
                h = h + jnp.swapaxes(nn.Dense(hidden, name=f"lstm{d}_proj")(s), 0, 1)
            h = nn.Conv(2 * self.channels, (1,), name=f"conv{d}_b")(h)
            h = nn.GroupNorm(num_groups=1, name=f"norm{d}_b")(h)
            h = nn.glu(h, axis=-1)
            scale = self.param(f"layer_scale{d}",
                               lambda k: jnp.full((self.channels,), 1e-3))
            x = x + scale * h
        return x


class EncLayer(nn.Module):
    out_ch: int
    kernel: int = 8
    stride: int = 4
    norm: bool = False
    use_lstm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, L, C)
        pad = self.kernel // self.stride  # small same-ish pad like demucs
        # FastConv1d: identical math/params to nn.Conv; custom backward
        # avoids the lhs-dilated data-grad conv (PERF_NOTES #10)
        from remfx_tpu.ops.fastconv import FastConv1d

        h = FastConv1d(self.out_ch, self.kernel, self.stride, (pad, pad),
                       name="conv")(x)
        if self.norm:
            h = nn.GroupNorm(num_groups=4, name="norm1")(h)
        h = nn.gelu(h)
        h = DConv(self.out_ch, use_lstm=self.use_lstm, name="dconv")(h, train)
        g = nn.Conv(2 * self.out_ch, (1,), name="rewrite")(h)
        if self.norm:
            g = nn.GroupNorm(num_groups=4, name="norm2")(g)
        return nn.glu(g, axis=-1)


class DecLayer(nn.Module):
    out_ch: int
    kernel: int = 8
    stride: int = 4
    norm: bool = False
    last: bool = False

    @nn.compact
    def __call__(self, x, skip, length, train: bool = False):
        # x, skip: (B, L, C)
        if skip is not None:
            x = x + skip
        g = nn.Conv(2 * x.shape[-1], (1,), name="rewrite")(x)
        if self.norm:
            g = nn.GroupNorm(num_groups=4, name="norm1")(g)
        h = nn.glu(g, axis=-1)
        # transposed conv via subpixel phases (lax.conv_transpose pays the
        # full lhs-dilation cost on this backend; ops/subpixel.py is exact)
        from remfx_tpu.ops.subpixel import subpixel_conv_transpose

        kern = self.param(
            "convtr_kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, h.shape[-1], self.out_ch),
        )
        kb = self.param("convtr_bias", nn.initializers.zeros, (self.out_ch,))
        h = subpixel_conv_transpose(
            h[:, :, None, :], kern[:, None, :, :].astype(h.dtype), (self.stride, 1)
        )[:, :, 0, :] + kb.astype(h.dtype)
        # crop the transposed-conv overlap to the target length (demucs
        # trims kernel-stride border samples)
        border = (self.kernel - self.stride) // 2
        h = h[:, border : border + length, :]
        if h.shape[1] < length:
            h = jnp.pad(h, [(0, 0), (0, length - h.shape[1]), (0, 0)])
        if not self.last:
            if self.norm:
                h = nn.GroupNorm(num_groups=4, name="norm2")(h)
            h = nn.gelu(h)
        return h


class HDemucs(nn.Module):
    sources: tuple = ("mixture",)
    audio_channels: int = 1
    channels: int = 48
    nfft: int = 4096
    depth: int = 5  # per-branch layers before the shared bottleneck

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, C, T) -> (B, n_sources*C, T)."""
        B, C, T = x.shape
        hop = self.nfft // 4
        # pad time so it divides the hop
        Tp = -(-T // hop) * hop
        xp = jnp.pad(x, [(0, 0), (0, 0), (0, Tp - T)])

        n = np.arange(self.nfft)
        window = jnp.asarray(
            (0.5 * (1.0 - np.cos(2.0 * np.pi * n / self.nfft))).astype(np.float32)
        )
        re, im = stft_ri(xp, self.nfft, hop, window)  # (B, C, F, N)
        re, im = re[..., :-1, :], im[..., :-1, :]  # drop Nyquist bin
        Fq, N = re.shape[-2], re.shape[-1]
        # CaC: (B, F, N, 2C) features-last image with freq as the "length"
        spec = jnp.concatenate([re, im], axis=1)  # (B, 2C, F, N)
        zs = jnp.transpose(spec, (0, 3, 2, 1))  # (B, N, F, 2C)
        zs = zs.reshape(B * N, Fq, 2 * C)

        chs = [self.channels * 2**k for k in range(self.depth)]  # 48..768

        # static sanity: freq axis must survive `depth` stride-4 layers
        fq_check = Fq
        for _ in range(self.depth):
            fq_check = (fq_check + 2 * 2 - 8) // 4 + 1
            if fq_check < 1:
                raise ValueError(
                    f"nfft={self.nfft} too small for depth={self.depth}: "
                    "the frequency axis collapses to zero"
                )

        # ---- freq branch encoders (convolve freq axis) ----
        f_skips = []
        f_lens = []
        h = zs
        for k, ch in enumerate(chs):
            f_lens.append(h.shape[1])
            h = EncLayer(ch, norm=k >= 4, name=f"freq_enc{k}")(h, train)
            if k == 0:
                # learned frequency embedding (demucs freq_emb)
                emb = self.param(
                    "freq_emb", nn.initializers.normal(0.02), (h.shape[1], ch)
                )
                h = h + emb[None, :, :]
            f_skips.append(h)
        # collapse remaining freq bins into channels
        Bf, Fr, Cf = h.shape
        hf = h.reshape(B, N, Fr * Cf)
        hf = nn.Dense(chs[-1], name="freq_merge")(hf)  # (B, N, 768)

        # ---- time branch encoders ----
        t_skips = []
        t_lens = []
        ht = jnp.swapaxes(xp, 1, 2)  # (B, Tp, C)
        for k, ch in enumerate(chs):
            t_lens.append(ht.shape[1])
            ht = EncLayer(ch, norm=k >= 4, name=f"time_enc{k}")(ht, train)
            t_skips.append(ht)
        # align time steps (stride 4^5 == hop) — crop to common length
        L = min(hf.shape[1], ht.shape[1])
        merged = hf[:, :L, :] + ht[:, :L, :]

        # ---- shared bottleneck ----
        bott = EncLayer(chs[-1] * 2, norm=True, use_lstm=True,
                        name="shared_enc")(merged, train)
        dec = DecLayer(chs[-1], norm=True, name="shared_dec")(
            bott, None, L, train
        )

        # ---- time decoder ----
        ht = dec
        for k in reversed(range(self.depth)):
            out_ch = chs[k - 1] if k > 0 else self.audio_channels * len(self.sources)
            ht = DecLayer(out_ch, norm=k >= 4, last=k == 0,
                          name=f"time_dec{k}")(
                ht, t_skips[k][:, : ht.shape[1], :], t_lens[k], train
            )
        wave_t = jnp.swapaxes(ht, 1, 2)[..., :T]  # (B, S*C, T)

        # ---- freq decoder ----
        hfd = nn.Dense(Fr * Cf, name="freq_unmerge")(dec)  # (B, L, Fr*Cf)
        hfd = hfd.reshape(B * N, Fr, Cf) if L == N else jnp.pad(
            hfd, [(0, 0), (0, N - L), (0, 0)]
        ).reshape(B * N, Fr, Cf)
        for k in reversed(range(self.depth)):
            out_ch = chs[k - 1] if k > 0 else 2 * self.audio_channels * len(self.sources)
            hfd = DecLayer(out_ch, norm=k >= 4, last=k == 0,
                           name=f"freq_dec{k}")(
                hfd, f_skips[k], f_lens[k], train
            )
        # (B*N, Fq, 2*S*C) -> spec re/im
        hfd = hfd.reshape(B, N, Fq, -1)
        spec_out = jnp.transpose(hfd, (0, 3, 2, 1))  # (B, 2SC, Fq, N)
        SC = spec_out.shape[1] // 2
        re_o = jnp.pad(spec_out[:, :SC], [(0, 0), (0, 0), (0, 1), (0, 0)])
        im_o = jnp.pad(spec_out[:, SC:], [(0, 0), (0, 0), (0, 1), (0, 0)])
        wave_f = istft_ri(re_o, im_o, self.nfft, hop, window, length=T)

        return wave_f + wave_t
