"""Test-only torch oracle of asteroid's DCUNet masker.

Written from asteroid's published structure (asteroid.models.DCUNet /
masknn DCUNetComplex{Encoder,Decoder}Block / complex_nn wrappers —
reference remfx/models.py:347-367) to validate models/dcunet.py and
compat.convert_dcunet: same state-dict naming (masker.encoders.{i}.conv.
re_module..., decoders.{i}.deconv..., output_layer), same forward
graph (skip-concat AFTER each decoder, bounded tanh mask). The conv /
transposed-conv / BatchNorm semantics come from torch itself; the
complex wrappers and ComplexBatchNorm follow the published specs
(Trabelsi et al. 2018 for the whitening BN). Front end: the same
tight-frame STFT filterbank (validated separately for perfect
reconstruction).

Not part of the framework — tests only.
"""

from __future__ import annotations

import numpy as np
import torch
from torch import nn


class ComplexMultiplicationWrapper(nn.Module):
    def __init__(self, module_cls, *args, **kwargs):
        super().__init__()
        self.re_module = module_cls(*args, **kwargs)
        self.im_module = module_cls(*args, **kwargs)

    def forward(self, x):
        return torch.complex(
            self.re_module(x.real) - self.im_module(x.imag),
            self.re_module(x.imag) + self.im_module(x.real),
        )


class OnReIm(nn.Module):
    def __init__(self, module_cls, *args, **kwargs):
        super().__init__()
        self.re_module = module_cls(*args, **kwargs)
        self.im_module = module_cls(*args, **kwargs)

    def forward(self, x):
        return torch.complex(self.re_module(x.real), self.im_module(x.imag))


class ComplexBatchNorm(nn.Module):
    """Trabelsi et al. complex whitening BN, asteroid parameterization:
    weight (C, 3) = [Wrr, Wri, Wii], bias (C, 2); running_mean (C, 2),
    running_covar (C, 3)."""

    def __init__(self, num_features, eps=1e-5, momentum=0.1):
        super().__init__()
        self.eps = eps
        self.momentum = momentum
        self.weight = nn.Parameter(torch.empty(num_features, 3))
        self.bias = nn.Parameter(torch.zeros(num_features, 2))
        self.register_buffer("running_mean", torch.zeros(num_features, 2))
        self.register_buffer("running_covar", torch.zeros(num_features, 3))
        self.register_buffer("num_batches_tracked",
                             torch.tensor(0, dtype=torch.long))
        self.weight.data[:, 0] = 1 / np.sqrt(2)
        self.weight.data[:, 1] = 0
        self.weight.data[:, 2] = 1 / np.sqrt(2)
        self.running_covar[:, 0] = 1 / np.sqrt(2)
        self.running_covar[:, 2] = 1 / np.sqrt(2)

    def forward(self, x):
        xr, xi = x.real, x.imag
        axes = [0] + list(range(2, xr.dim()))
        if self.training:
            mr = xr.mean(axes)
            mi = xi.mean(axes)
            cr = xr - _bc(mr, xr)
            ci = xi - _bc(mi, xi)
            vrr = (cr * cr).mean(axes) + self.eps
            vii = (ci * ci).mean(axes) + self.eps
            vri = (cr * ci).mean(axes)
            with torch.no_grad():
                m = self.momentum
                self.running_mean.mul_(1 - m).add_(
                    m * torch.stack([mr, mi], dim=1))
                self.running_covar.mul_(1 - m).add_(
                    m * torch.stack([vrr - self.eps, vri, vii - self.eps],
                                    dim=1))
        else:
            mr, mi = self.running_mean[:, 0], self.running_mean[:, 1]
            vrr = self.running_covar[:, 0] + self.eps
            vri = self.running_covar[:, 1]
            vii = self.running_covar[:, 2] + self.eps
            cr = xr - _bc(mr, xr)
            ci = xi - _bc(mi, xi)
        # per-channel inverse sqrt of the 2x2 covariance
        s = (vrr * vii - vri * vri).sqrt()
        t = (vrr + vii + 2 * s).sqrt()
        inv_st = 1.0 / (s * t)
        rrr = (vii + s) * inv_st
        rii = (vrr + s) * inv_st
        rri = -vri * inv_st
        xh_r = _bc(rrr, cr) * cr + _bc(rri, cr) * ci
        xh_i = _bc(rri, cr) * cr + _bc(rii, cr) * ci
        w, b = self.weight, self.bias
        yr = _bc(w[:, 0], xh_r) * xh_r + _bc(w[:, 1], xh_r) * xh_i + _bc(
            b[:, 0], xh_r)
        yi = _bc(w[:, 1], xh_r) * xh_r + _bc(w[:, 2], xh_r) * xh_i + _bc(
            b[:, 1], xh_r)
        return torch.complex(yr, yi)


def _bc(v, like):
    """(C,) -> (1, C, 1, 1, ...) broadcast against (B, C, ...)."""
    shape = [1, v.shape[0]] + [1] * (like.dim() - 2)
    return v.view(shape)


def _norm(norm_type, C):
    if norm_type == "bN":
        return OnReIm(nn.BatchNorm2d, C)
    if norm_type == "CbN":
        return ComplexBatchNorm(C)
    raise ValueError(norm_type)


class EncoderBlock(nn.Module):
    def __init__(self, in_chan, out_chan, kernel, stride, norm_type):
        super().__init__()
        pad = tuple((k - 1) // 2 for k in kernel)
        self.conv = ComplexMultiplicationWrapper(
            nn.Conv2d, in_chan, out_chan, kernel, stride, pad, bias=False)
        self.norm = _norm(norm_type, out_chan)
        self.act = OnReIm(nn.LeakyReLU, 0.01)

    def forward(self, x):
        return self.act(self.norm(self.conv(x)))


class DecoderBlock(nn.Module):
    def __init__(self, in_chan, out_chan, kernel, stride, norm_type):
        super().__init__()
        pad = tuple((k - 1) // 2 for k in kernel)
        self.deconv = ComplexMultiplicationWrapper(
            nn.ConvTranspose2d, in_chan, out_chan, kernel, stride, pad,
            bias=False)
        self.norm = _norm(norm_type, out_chan)
        self.act = OnReIm(nn.LeakyReLU, 0.01)

    def forward(self, x):
        return self.act(self.norm(self.deconv(x)))


class Masker(nn.Module):
    """asteroid DCUMaskNet graph over complex (B, 1, F, T)."""

    def __init__(self, stages, norm_type="bN"):
        super().__init__()
        self.stages = stages
        self.encoders = nn.ModuleList([
            EncoderBlock(cin, cout, k, s, norm_type)
            for cin, cout, k, s in stages
        ])
        dec_args = []
        for j, (cin, cout, kernel, stride) in enumerate(reversed(stages)):
            skip = cout if dec_args else 0
            dec_args.append((cout + skip, cin, kernel, stride))
        self.decoders = nn.ModuleList([
            DecoderBlock(*args, norm_type) for args in dec_args[:-1]
        ])
        cin, cout, kernel, stride = dec_args[-1]
        pad = tuple((k - 1) // 2 for k in kernel)
        self.output_layer = ComplexMultiplicationWrapper(
            nn.ConvTranspose2d, cin, cout, kernel, stride, pad, bias=False)
        self.time_prod = int(np.prod([s[3][1] for s in stages]))

    def forward(self, x):
        # x complex (B, 1, F, T); fix_input_dims 'pad'
        N_in = x.shape[-1]
        pad_t = (-(N_in - 1)) % self.time_prod
        x = torch.nn.functional.pad(x, (0, pad_t))
        enc_outs = []
        for enc in self.encoders:
            x = enc(x)
            enc_outs.append(x)
        for enc_out, dec in zip(reversed(enc_outs[:-1]), self.decoders):
            x = dec(x)
            x = torch.cat([x, enc_out], dim=1)
        m = self.output_layer(x)[..., :N_in]
        mag = (m.real**2 + m.imag**2 + 1e-12).sqrt()
        scale = torch.tanh(mag) / mag
        return torch.complex(m.real * scale, m.imag * scale)


class TorchDCUNet(nn.Module):
    """Full oracle: shared tight-frame STFT filterbank + Masker."""

    def __init__(self, stages, kernel_size, norm_type="bN", filters=None):
        super().__init__()
        self.kernel_size = kernel_size
        self.masker = Masker(stages, norm_type)
        self.register_buffer("filters", torch.from_numpy(filters))

    def forward(self, wav):
        # wav (B, T)
        K = self.kernel_size
        cutoff = K // 2 + 1
        T_in = wav.shape[-1]
        spec = torch.nn.functional.conv1d(
            wav[:, None, :], self.filters[:, None, :], stride=K // 2)
        z = torch.complex(spec[:, :cutoff], spec[:, cutoff:])
        mask = self.masker(z[:, None])[:, 0]
        y = z * mask
        spec_out = torch.cat([y.real, y.imag], dim=1)
        out = torch.nn.functional.conv_transpose1d(
            spec_out, self.filters[:, None, :], stride=K // 2)[:, 0]
        if out.shape[-1] >= T_in:
            return out[:, :T_in]
        return torch.nn.functional.pad(out, (0, T_in - out.shape[-1]))
