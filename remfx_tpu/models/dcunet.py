"""DCUNet — complex-valued U-Net on STFT (Large-DCUNet-20).

Parity target: the reference's ``DCUNetModel`` (remfx/models.py:347-367)
wrapping ``asteroid.models.DCUNet("Large-DCUNet-20", stft_kernel_size=512,
fix_length_mode="pad")`` — "Phase-aware Speech Enhancement with Deep
Complex U-Net" (Choi et al., ICLR 2019).

Architecture (asteroid's Large-DCUNet-20 table): 10 encoder stages
(channels 1→45→45→90×7→128, kernels (7,1),(1,7),(7,5),(7,5),(5,3)...,
freq/time strides interleaving (2,2)/(2,1)) and mirrored decoders with
complex skip concatenation; bounded complex tanh mask on the input STFT;
iSTFT back to audio.

Complex ops are carried as (re, im) channel pairs (the target TPU has no
complex dtype): complex conv = 4 real convs; complex BN = naive per-part
BN; activation = leaky ReLU on both parts (asteroid's default).

NOTE weight-compat vs asteroid: the structural layout (stage names,
conv kernels) is designed for 1:1 import, but asteroid's exact complex-BN
variant could not be verified offline in this environment — converter
validation is tracked for a follow-up round. Training from scratch in
this framework is fully supported.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from remfx_tpu.ops.stft import istft_ri, stft_ri

# (in_ch, out_ch, kernel (F,T), stride (F,T)) per encoder stage
LARGE_DCUNET_20 = (
    (1, 45, (7, 1), (1, 1)),
    (45, 45, (1, 7), (1, 1)),
    (45, 90, (7, 5), (2, 2)),
    (90, 90, (7, 5), (2, 1)),
    (90, 90, (5, 3), (2, 2)),
    (90, 90, (5, 3), (2, 1)),
    (90, 90, (5, 3), (2, 2)),
    (90, 90, (5, 3), (2, 1)),
    (90, 90, (5, 3), (2, 2)),
    (90, 128, (5, 3), (2, 1)),
)

DCUNET_ARCHITECTURES = {"Large-DCUNet-20": LARGE_DCUNET_20}


def _same_pad(kernel, stride):
    # asteroid uses "auto" padding = (k-1)//2 per dim
    return tuple((k - 1) // 2 for k in kernel)


class ComplexConv(nn.Module):
    """Complex conv, two interchangeable lowerings (same params/math):

    * stacked (default): [yr; yi] = conv([xr; xi], [[wr, wi], [-wi, wr]])
      as ONE (2C_in -> 2C_out) real conv — 4 unit-conv FLOPs, one MXU
      dispatch.
    * gauss: Gauss's 3-multiplication trick — t1 = conv(xr, wr),
      t2 = conv(xi, wi), t3 = conv(xr+xi, wr+wi); yr = t1 - t2,
      yi = t3 - t1 - t2 — 3 unit-conv FLOPs (25% fewer), 3 dispatches
      with half-width channel dims.

    Parameters stay separate re/im kernels either way (weight-compat).
    """

    features: int
    kernel: tuple
    stride: tuple = (1, 1)
    transpose: bool = False
    gauss: bool = False

    def _conv(self, x, k, padding):
        if self.transpose:
            # subpixel path: lax.conv_transpose pays the full lhs-dilation
            # cost on this backend (ops/subpixel.py) — this is exact
            from remfx_tpu.ops.subpixel import subpixel_conv_transpose

            y = subpixel_conv_transpose(x, k, self.stride)
            # explicit-padding semantics: trim (p, p) borders like
            # lax.conv_transpose(padding=[(p, p)]) would
            (ph, _), (pw, _) = padding
            return y[:, ph : y.shape[1] - ph, pw : y.shape[2] - pw, :]
        if tuple(self.stride) != (1, 1):
            # custom backward: the strided conv's data-grad would lower
            # to the catastrophic lhs-dilated conv (PERF_NOTES #10)
            from remfx_tpu.ops.fastconv import strided_conv2d

            return strided_conv2d(x, k, tuple(self.stride), tuple(padding))
        return jax.lax.conv_general_dilated(
            x, k, window_strides=self.stride, padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    @nn.compact
    def __call__(self, xr, xi):
        pad = _same_pad(self.kernel, self.stride)
        padding = [(p, p) for p in pad]
        cin = xr.shape[-1]
        kshape = self.kernel + (cin, self.features)
        wr = self.param("re_kernel", nn.initializers.lecun_normal(), kshape)
        wi = self.param("im_kernel", nn.initializers.lecun_normal(), kshape)
        br = self.param("re_bias", nn.initializers.zeros, (self.features,))
        bi = self.param("im_bias", nn.initializers.zeros, (self.features,))
        if self.gauss:
            dt = xr.dtype
            t1 = self._conv(xr, wr.astype(dt), padding)
            t2 = self._conv(xi, wi.astype(dt), padding)
            t3 = self._conv(xr + xi, (wr + wi).astype(dt), padding)
            yr = t1 - t2 + br.astype(dt)
            yi = t3 - t1 - t2 + bi.astype(dt)
            return yr, yi
        x = jnp.concatenate([xr, xi], axis=-1)
        # [yr; yi]: yr = xr*wr - xi*wi ; yi = xr*wi + xi*wr
        k = jnp.concatenate(
            [
                jnp.concatenate([wr, wi], axis=-1),      # from xr
                jnp.concatenate([-wi, wr], axis=-1),     # from xi
            ],
            axis=-2,
        ).astype(x.dtype)  # (kh, kw, 2cin, 2cout)
        y = self._conv(x, k, padding)
        bias = jnp.concatenate([br, bi]).astype(y.dtype)
        y = y + bias
        return y[..., : self.features], y[..., self.features :]


class ComplexBNAct(nn.Module):
    negative_slope: float = 0.01

    @nn.compact
    def __call__(self, xr, xi, train: bool):
        xr = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn_re")(xr)
        xi = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn_im")(xi)
        act = lambda v: jax.nn.leaky_relu(v, self.negative_slope)
        return act(xr), act(xi)


class DCUNet(nn.Module):
    architecture: str = "Large-DCUNet-20"
    stft_kernel_size: int = 512
    stft_stride: int | None = None
    fix_length_mode: str = "pad"
    gauss_conv: bool = False  # Gauss 3-mult complex convs (same math)

    @property
    def stages(self):
        return DCUNET_ARCHITECTURES[self.architecture]

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, T) or (B, 1, T) waveform -> (B, T) enhanced waveform."""
        squeeze_ch = x.ndim == 3
        if squeeze_ch:
            x = x[:, 0, :]
        T_in = x.shape[-1]
        hop = self.stft_stride or self.stft_kernel_size // 2
        n = np.arange(self.stft_kernel_size)
        window = jnp.asarray(
            (0.5 * (1.0 - np.cos(2.0 * np.pi * n / self.stft_kernel_size))).astype(
                np.float32
            )
        )
        re, im = stft_ri(x, self.stft_kernel_size, hop, window)  # (B, F, N)
        F_full, N_in = re.shape[-2], re.shape[-1]

        # No divisibility pre-padding: strided convs with explicit (p, p)
        # padding handle odd spatial dims exactly like torch's, and the
        # decoder snaps each upsample back to the recorded encoder shape
        # (fit_to below) — padding F 257->512 would double every stage's
        # FLOPs for zeros.
        hr = re[..., None]  # (B, F, N, C=1)
        hi = im[..., None]
        skips = []
        shapes = [hr.shape[1:3]]  # spatial dims entering each stage
        for k, (cin, cout, kernel, stride) in enumerate(self.stages):
            hr, hi = ComplexConv(cout, kernel, stride, gauss=self.gauss_conv,
                                 name=f"enc{k}_conv")(hr, hi)
            hr, hi = ComplexBNAct(name=f"enc{k}_norm")(hr, hi, train)
            skips.append((hr, hi))
            shapes.append(hr.shape[1:3])

        def fit_to(h, target):
            # torch/asteroid use output_padding to invert strided convs
            # exactly; flax ConvTranspose lacks it, so snap to the known
            # encoder spatial dims (crop or zero-pad by <= stride-1)
            df = target[0] - h.shape[1]
            dt = target[1] - h.shape[2]
            if df > 0 or dt > 0:
                h = jnp.pad(h, [(0, 0), (0, max(df, 0)), (0, max(dt, 0)), (0, 0)])
            return h[:, : target[0], : target[1], :]

        dec_stages = list(reversed(self.stages))
        for k, (cin, cout, kernel, stride) in enumerate(dec_stages):
            last = k == len(dec_stages) - 1
            if k > 0:
                sr_, si_ = skips[len(dec_stages) - 1 - k]
                hr = jnp.concatenate([hr, sr_], axis=-1)
                hi = jnp.concatenate([hi, si_], axis=-1)
            out_ch = 1 if last else cin
            hr, hi = ComplexConv(
                out_ch, kernel, stride, transpose=True,
                gauss=self.gauss_conv, name=f"dec{k}_conv"
            )(hr, hi)
            target = shapes[len(dec_stages) - 1 - k]
            hr, hi = fit_to(hr, target), fit_to(hi, target)
            if not last:
                hr, hi = ComplexBNAct(name=f"dec{k}_norm")(hr, hi, train)

        mr = hr[..., 0][:, :F_full, :N_in]
        mi = hi[..., 0][:, :F_full, :N_in]
        # bounded complex mask: tanh(|m|) * m / |m|
        mag = jnp.sqrt(mr * mr + mi * mi + 1e-12)
        scale = jnp.tanh(mag) / mag
        mr, mi = mr * scale, mi * scale
        # complex multiply with input stft
        yr = mr * re - mi * im
        yi = mr * im + mi * re
        y = istft_ri(yr, yi, self.stft_kernel_size, hop, window, length=T_in)
        return y[:, None, :] if squeeze_ch else y
