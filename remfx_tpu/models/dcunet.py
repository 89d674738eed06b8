"""DCUNet — complex-valued U-Net on STFT, asteroid-isomorphic.

Parity target: the reference's ``DCUNetModel`` (remfx/models.py:347-367)
wrapping ``asteroid.models.DCUNet("Large-DCUNet-20",
stft_kernel_size=512, fix_length_mode="pad")`` — "Phase-aware Speech
Enhancement with Deep Complex U-Net" (Choi et al., ICLR 2019), asteroid
implementation (carries 3 of the 5 published removal checkpoints:
dcunet_{chorus,delay,reverb}_aug, reference scripts/download_ckpts.sh).

Asteroid structure reproduced parameter-for-parameter (see
compat/MAPPING.md):
  * front end: asteroid_filterbanks STFTFB — sqrt(periodic-hann)
    window, stride = kernel/2, tight-frame normalization
    (/= 0.5*sqrt(K*N/stride); DC and Nyquist rows /= sqrt(2)); encoder
    = framing conv, decoder = transposed conv overlap-add (COLA, no
    NOLA division). No learnable params.
  * masker: 10 complex encoder blocks [ComplexConv2d (re/im module
    pair, no bias under norm) -> norm -> leaky_relu(0.01)], 9 decoder
    blocks [ComplexConvTranspose2d -> norm -> leaky_relu] with skip
    CONCAT after each decode, plain ComplexConvTranspose2d output
    layer; bounded mask tanh(|m|)*m/|m|; mask * input STFT.
  * fix_input_dims ('pad'): time frames zero-padded so
    (T-1) % prod(time strides) == 0; frequency must satisfy
    (F-1) % prod(freq strides) == 0 (raises otherwise, like asteroid).
  * norm_type: "bN" (asteroid default: independent re/im BatchNorm,
    torch names re_module/im_module) or "CbN" (Trabelsi et al. complex
    whitening BN, weight (C,3) / bias (C,2)); the checkpoint converter
    auto-detects which one a state dict contains.

TPU-first: complex convs lower to ONE real conv on the MXU (block
kernel [[wr, wi], [-wi, wr]]) or Gauss's 3-mult trick (``gauss_conv``);
strided convs/transposes route through ops/fastconv + ops/subpixel
(exact, backend-friendly backwards); the framing conv reuses the
custom-VJP framed-DFT kernel of ops/stft.

The extra "Mini-DCUNet-6" architecture (this framework only) is a
3-stage variant for cheap tests/streaming configs.
"""

from __future__ import annotations

from functools import lru_cache

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from remfx_tpu.ops.fastconv import strided_conv2d
from remfx_tpu.ops.subpixel import subpixel_conv_transpose

# (in_chan, out_chan, kernel (F,T), stride (F,T)) per encoder stage;
# paddings are asteroid "auto" = (k-1)//2. Decoder/output args derive
# from these (asteroid unet_decoder_args).
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

# test/streaming-size variant (freq stride product 4, time product 2)
MINI_DCUNET_6 = (
    (1, 16, (5, 1), (1, 1)),
    (16, 16, (1, 5), (1, 1)),
    (16, 32, (5, 3), (2, 2)),
    (32, 32, (3, 3), (2, 1)),
)

DCUNET_ARCHITECTURES = {
    "Large-DCUNet-20": LARGE_DCUNET_20,
    "Mini-DCUNet-6": MINI_DCUNET_6,
}


@lru_cache(maxsize=8)
def _stft_filters(kernel_size: int, n_filters: int | None = None):
    """asteroid_filterbanks.STFTFB filters: (2*(n//2+1), n) float32.

    n_filters defaults to kernel_size (the DCUNet paper's 512-pt
    window); when n_filters > kernel_size the sqrt-hann window is
    center-padded with zeros (asteroid's zero-padded DFT). NOTE
    (MAPPING.md): asteroid's own default for stft_n_filters could not
    be verified offline — the masker weights are F-agnostic, so this
    only affects eval numerics, not checkpoint import."""
    K = kernel_size
    n = n_filters or K
    stride = K // 2
    cutoff = n // 2 + 1
    window = np.hanning(K + 1)[:-1] ** 0.5  # sqrt periodic hann
    if n > K:
        lpad = (n - K) // 2
        window = np.pad(window, (lpad, n - K - lpad))
    f = np.fft.fft(np.eye(n))
    f /= 0.5 * np.sqrt(K * n / stride)
    filters = np.concatenate([np.real(f[:cutoff]), np.imag(f[:cutoff])])
    filters[0, :] /= np.sqrt(2)
    filters[n // 2, :] /= np.sqrt(2)
    return (filters * window[None, :]).astype(np.float32)


def asteroid_stft(x, kernel_size: int):
    """x (B, T) -> (re, im) each (B, F, N); asteroid Encoder semantics
    (VALID framing conv at stride K/2, no centering)."""
    from remfx_tpu.ops.stft import _framed_dft

    K = kernel_size
    cutoff = K // 2 + 1
    # keep the caller's compute dtype: forcing f32 here silently
    # promoted every downstream conv to f32 under the bf16-mixed
    # policy (activations f32 x weights bf16 -> f32), erasing the MXU
    # bf16 speedup for the whole network
    filt = jnp.asarray(_stft_filters(K))[:, None, :].astype(x.dtype)
    y = _framed_dft(x[:, None, :], filt, K // 2)
    return y[:, :cutoff, :], y[:, cutoff:, :]


def asteroid_istft(re, im, kernel_size: int, length: int):
    """(re, im) (B, F, N) -> (B, length); asteroid Decoder semantics
    (transposed filterbank overlap-add; tight frame, no NOLA division)."""
    from remfx_tpu.ops.stft import _overlap_add

    K = kernel_size
    spec = jnp.concatenate([re, im], axis=1)  # (B, 2F, N)
    # match the caller's compute dtype (see asteroid_stft): f32 filters
    # would promote the einsum output — and everything downstream of the
    # decoder — back to f32 under the bf16 inference policy
    filt = jnp.asarray(_stft_filters(K)).astype(spec.dtype)  # (2F, K)
    frames = jnp.einsum("bcn,ct->bnt", spec, filt,
                        precision=jax.lax.Precision.HIGHEST)
    n_frames = frames.shape[1]
    out_len = K + (K // 2) * (n_frames - 1)
    y = _overlap_add(frames, K // 2, out_len)
    if out_len >= length:
        return y[:, :length]
    return jnp.pad(y, [(0, 0), (0, length - out_len)])


class ComplexConv(nn.Module):
    """asteroid ComplexConv2d (re_module/im_module Conv2d pair):
    y = (conv_r(xr) - conv_i(xi), conv_r(xi) + conv_i(xr)).

    Two interchangeable MXU lowerings of the same math/params:
      * stacked (default): one (2Cin -> 2Cout) real conv with the block
        kernel [[wr, wi], [-wi, wr]];
      * gauss: Gauss's 3-multiplication trick (25% fewer FLOPs).
    """

    features: int
    kernel: tuple
    stride: tuple = (1, 1)
    transpose: bool = False
    use_bias: bool = False  # asteroid: bias only when norm_type is None
    gauss: bool = False

    @nn.compact
    def __call__(self, xr, xi):
        pad = tuple((k - 1) // 2 for k in self.kernel)
        cin = xr.shape[-1]
        # (kh, kw, in, out) in torch tap order for both Conv2d and
        # ConvTranspose2d (the converter permutes torch's layouts here)
        kshape = self.kernel + (cin, self.features)
        wr = self.param("re_kernel", nn.initializers.lecun_normal(), kshape)
        wi = self.param("im_kernel", nn.initializers.lecun_normal(), kshape)
        if self.use_bias:
            br = self.param("re_bias", nn.initializers.zeros, (self.features,))
            bi = self.param("im_bias", nn.initializers.zeros, (self.features,))

        if self.transpose:
            def convtr(v, k):
                y = subpixel_conv_transpose(
                    v, k[::-1, ::-1, :, :].astype(v.dtype), self.stride
                )
                (ph, pw) = pad
                return y[:, ph : y.shape[1] - ph, pw : y.shape[2] - pw, :]

            if self.gauss:
                t1 = convtr(xr, wr)
                t2 = convtr(xi, wi)
                t3 = convtr(xr + xi, wr + wi)
                yr, yi = t1 - t2, t3 - t1 - t2
            else:
                x = jnp.concatenate([xr, xi], axis=-1)
                k = jnp.concatenate(
                    [jnp.concatenate([wr, wi], axis=-1),
                     jnp.concatenate([-wi, wr], axis=-1)], axis=-2)
                y = convtr(x, k)
                yr, yi = y[..., : self.features], y[..., self.features :]
        else:
            padding = [(p, p) for p in pad]

            def conv(v, k):
                if tuple(self.stride) != (1, 1):
                    return strided_conv2d(v, k.astype(v.dtype),
                                          tuple(self.stride), tuple(padding))
                return jax.lax.conv_general_dilated(
                    v, k.astype(v.dtype), window_strides=self.stride,
                    padding=padding,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )

            if self.gauss:
                t1 = conv(xr, wr)
                t2 = conv(xi, wi)
                t3 = conv(xr + xi, wr + wi)
                yr, yi = t1 - t2, t3 - t1 - t2
            else:
                x = jnp.concatenate([xr, xi], axis=-1)
                k = jnp.concatenate(
                    [jnp.concatenate([wr, wi], axis=-1),
                     jnp.concatenate([-wi, wr], axis=-1)], axis=-2)
                y = conv(x, k)
                yr, yi = y[..., : self.features], y[..., self.features :]
        if self.use_bias:
            # asteroid applies each module's bias inside the wrapper:
            # yr += br - bi ; yi += br + bi
            yr = yr + (br - bi).astype(yr.dtype)
            yi = yi + (br + bi).astype(yi.dtype)
        return yr, yi


class OnReImBatchNorm(nn.Module):
    """asteroid norm_type='bN' lowered onto complex pairs: independent
    BatchNorm on re and im (torch names re_module / im_module)."""

    @nn.compact
    def __call__(self, xr, xi, train: bool):
        xr = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, name="re_module")(xr)
        xi = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, name="im_module")(xi)
        return xr, xi


class ComplexBatchNorm(nn.Module):
    """norm_type='CbN': complex whitening BN (Trabelsi et al. 2018).

    params: weight (C, 3) = [Wrr, Wri, Wii] (init [1/sqrt2, 0, 1/sqrt2]),
    bias (C, 2); batch_stats: mean (C, 2), covar (C, 3) (Vrr/Vii init
    1/sqrt2). Matches asteroid.complex_nn.ComplexBatchNorm naming."""

    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, xr, xi, train: bool):
        C = xr.shape[-1]
        w = self.param(
            "weight",
            lambda _k: jnp.stack([
                jnp.full((C,), 1 / np.sqrt(2)), jnp.zeros((C,)),
                jnp.full((C,), 1 / np.sqrt(2)),
            ], axis=1),
        )
        b = self.param("bias", nn.initializers.zeros, (C, 2))
        ra_mean = self.variable(
            "batch_stats", "running_mean", lambda: jnp.zeros((C, 2)))
        ra_covar = self.variable(
            "batch_stats", "running_covar",
            lambda: jnp.stack([
                jnp.full((C,), 1 / np.sqrt(2)), jnp.zeros((C,)),
                jnp.full((C,), 1 / np.sqrt(2)),
            ], axis=1),
        )
        axes = tuple(i for i in range(xr.ndim) if i != xr.ndim - 1)
        if train:
            mr = jnp.mean(xr, axis=axes)
            mi = jnp.mean(xi, axis=axes)
            cr = xr - mr
            ci = xi - mi
            vrr = jnp.mean(cr * cr, axis=axes) + self.eps
            vii = jnp.mean(ci * ci, axis=axes) + self.eps
            vri = jnp.mean(cr * ci, axis=axes)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * jnp.stack(
                    [mr, mi], axis=1)
                ra_covar.value = (1 - m) * ra_covar.value + m * jnp.stack(
                    [vrr - self.eps, vri, vii - self.eps], axis=1)
        else:
            mr, mi = ra_mean.value[:, 0], ra_mean.value[:, 1]
            vrr = ra_covar.value[:, 0] + self.eps
            vri = ra_covar.value[:, 1]
            vii = ra_covar.value[:, 2] + self.eps
            cr = xr - mr
            ci = xi - mi
        # inverse sqrt of the per-channel 2x2 covariance
        s = jnp.sqrt(vrr * vii - vri * vri)
        t = jnp.sqrt(vrr + vii + 2 * s)
        inv_st = 1.0 / (s * t)
        rrr = (vii + s) * inv_st
        rii = (vrr + s) * inv_st
        rri = -vri * inv_st
        xh_r = rrr * cr + rri * ci
        xh_i = rri * cr + rii * ci
        wrr, wri, wii = w[:, 0], w[:, 1], w[:, 2]
        yr = wrr * xh_r + wri * xh_i + b[:, 0]
        yi = wri * xh_r + wii * xh_i + b[:, 1]
        return yr, yi


def _norm(norm_type: str, name: str):
    if norm_type == "CbN":
        return ComplexBatchNorm(name=name)
    if norm_type == "bN":
        return OnReImBatchNorm(name=name)
    raise ValueError(f"unknown norm_type {norm_type!r}")


def _lrelu(v):
    return jax.nn.leaky_relu(v, 0.01)


def _decoder_args(stages):
    """asteroid unet_decoder_args(skip_connections=True): decoder j
    inverts encoder -1-j; input channels double where a skip concat
    feeds it. Returns (dec_args, output_layer_args)."""
    args = []
    for j, (cin, cout, kernel, stride) in enumerate(reversed(stages)):
        skip = cout if args else 0
        args.append((cout + skip, cin, kernel, stride))
    return args[:-1], args[-1]


class DCUNet(nn.Module):
    architecture: str = "Large-DCUNet-20"
    stft_kernel_size: int = 512
    fix_length_mode: str = "pad"
    norm_type: str = "bN"  # asteroid default; "CbN" = complex whitening
    gauss_conv: bool = False  # Gauss 3-mult complex convs (same math)
    # near-identity start (training aid, NOT in asteroid): adds a
    # learnable complex bias to the raw mask, init (1.5, 0) so the
    # bounded mask starts ~tanh(1.5)=0.9+0j and the fresh model passes
    # audio through instead of scrambling it (a random mask costs
    # ~5-10 dB SI-SDR the optimizer must claw back first). The param
    # exists ONLY when the flag is set, so torch-checkpoint import
    # (identity_init=False) is structurally unchanged.
    identity_init: bool = False

    @property
    def stages(self):
        return DCUNET_ARCHITECTURES[self.architecture]

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, T) or (B, 1, T) waveform -> same-shape estimate."""
        squeeze_ch = x.ndim == 3
        if squeeze_ch:
            x = x[:, 0, :]
        T_in = x.shape[-1]
        K = self.stft_kernel_size
        # asteroid pads the wav so at least one full frame exists
        if T_in < K:
            x = jnp.pad(x, [(0, 0), (0, K - T_in)])
        re, im = asteroid_stft(x, K)  # (B, F, N)
        F_full, N_in = re.shape[-2], re.shape[-1]

        freq_prod = int(np.prod([s[3][0] for s in self.stages]))
        time_prod = int(np.prod([s[3][1] for s in self.stages]))
        if (F_full - 1) % freq_prod:
            raise TypeError(
                f"freq axis {F_full} incompatible with architecture "
                f"{self.architecture} (needs (F-1) % {freq_prod} == 0); "
                "use a matching stft_kernel_size"
            )
        # fix_input_dims('pad'): (N-1) % time_prod == 0
        pad_t = (-(N_in - 1)) % time_prod
        hr = jnp.pad(re, [(0, 0), (0, 0), (0, pad_t)])[..., None]
        hi = jnp.pad(im, [(0, 0), (0, 0), (0, pad_t)])[..., None]

        skips = []
        for k, (cin, cout, kernel, stride) in enumerate(self.stages):
            hr, hi = ComplexConv(cout, kernel, stride, gauss=self.gauss_conv,
                                 name=f"enc{k}_conv")(hr, hi)
            hr, hi = _norm(self.norm_type, f"enc{k}_norm")(hr, hi, train)
            hr, hi = _lrelu(hr), _lrelu(hi)
            skips.append((hr, hi))

        dec_args, out_args = _decoder_args(self.stages)
        for k, (cin, cout, kernel, stride) in enumerate(dec_args):
            hr, hi = ComplexConv(cout, kernel, stride, transpose=True,
                                 gauss=self.gauss_conv,
                                 name=f"dec{k}_conv")(hr, hi)
            hr, hi = _norm(self.norm_type, f"dec{k}_norm")(hr, hi, train)
            hr, hi = _lrelu(hr), _lrelu(hi)
            sr_, si_ = skips[len(dec_args) - 1 - k]
            hr = jnp.concatenate([hr, sr_], axis=-1)
            hi = jnp.concatenate([hi, si_], axis=-1)
        _, out_ch, out_kernel, out_stride = out_args
        hr, hi = ComplexConv(out_ch, out_kernel, out_stride, transpose=True,
                             gauss=self.gauss_conv, name="output_conv")(hr, hi)

        mr = hr[..., 0][:, :F_full, :N_in]
        mi = hi[..., 0][:, :F_full, :N_in]
        if self.identity_init:
            mask_bias = self.param(
                "mask_bias",
                lambda _k: jnp.array([1.5, 0.0], jnp.float32),
            )
            mr = mr + mask_bias[0].astype(mr.dtype)
            mi = mi + mask_bias[1].astype(mi.dtype)
        # bounded complex mask: tanh(|m|) * m / |m|
        mag = jnp.sqrt(mr * mr + mi * mi + 1e-12)
        scale = jnp.tanh(mag) / mag
        mr, mi = mr * scale, mi * scale
        yr = mr * re - mi * im
        yi = mr * im + mi * re
        y = asteroid_istft(yr, yi, K, length=T_in)
        return y[:, None, :] if squeeze_ch else y
