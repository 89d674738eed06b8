"""Strided conv with a backend-friendly backward.

XLA's data-gradient of a strided convolution lowers to a conv with
``lhs_dilation = stride`` — the dense dilated conv this backend executes
catastrophically (PERF_NOTES #5/#10). The mathematical adjoint is a
transposed conv, which we already run efficiently as phase-decomposed
dense conv + depth-to-space (ops/subpixel.py). This module packages a
``jax.custom_vjp`` strided conv whose

  * forward     = plain ``lax.conv_general_dilated`` (unchanged),
  * dx backward = ``subpixel_conv_transpose`` with the channel-swapped
                  kernel (exact adjoint),
  * dw backward = conv with ``rhs_dilation = stride`` contracting the
                  batch dim (the standard rhs-transpose trick; atrous
                  kernels are fast on this backend — TCN's forward
                  uses them heavily).

NHWC / HWIO layouts, explicit symmetric padding only.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from remfx_tpu.ops.subpixel import subpixel_conv_transpose


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def strided_conv2d(x, k, strides, padding):
    """x (B, H, W, Cin), k (kh, kw, Cin, Cout), strides (sh, sw),
    padding ((ph, ph'), (pw, pw')) -> (B, H', W', Cout)."""
    return jax.lax.conv_general_dilated(
        x, k, window_strides=strides, padding=list(padding),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _fwd(x, k, strides, padding):
    return strided_conv2d(x, k, strides, padding), (x, k)


def _bwd(strides, padding, res, dy):
    x, k = res
    kh, kw, cin, cout = k.shape
    sh, sw = strides
    (ph0, ph1), (pw0, pw1) = padding
    B, H, W, _ = x.shape

    # ---- dx: scatter each dy tap through the kernel (transposed conv).
    # subpixel_conv_transpose applies the spatially flipped kernel, so
    # pre-flip + channel-swap yields the exact adjoint correlation.
    k_adj = jnp.transpose(k, (0, 1, 3, 2))[::-1, ::-1, :, :]
    dxp = subpixel_conv_transpose(dy, k_adj.astype(dy.dtype), strides)
    # dxp covers the padded extent (N-1)s + k; crop padding, pad any
    # tail the forward windows never reached
    Hp, Wp = H + ph0 + ph1, W + pw0 + pw1
    need_h, need_w = ph0 + H, pw0 + W
    pad_h = max(0, need_h - dxp.shape[1])
    pad_w = max(0, need_w - dxp.shape[2])
    if pad_h or pad_w:
        dxp = jnp.pad(dxp, [(0, 0), (0, pad_h), (0, pad_w), (0, 0)])
    dx = dxp[:, ph0 : ph0 + H, pw0 : pw0 + W, :]

    # ---- dw: contract dy against input windows — conv with the batch
    # dim as the contracting dim and rhs_dilation = stride
    xp = jnp.pad(x, [(0, 0), (ph0, ph1), (pw0, pw1), (0, 0)])
    lhs = jnp.transpose(xp, (3, 1, 2, 0))  # (Cin, Hp, Wp, B): N=Cin, C=B
    rhs = jnp.transpose(dy, (1, 2, 0, 3))  # (Nh, Nw, B, Cout): HWIO, I=B
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding=[(0, 0), (0, 0)],
        rhs_dilation=strides, dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (Cin, kh(+r), kw(+r), Cout); positions >= k are never-touched tail
    dk = jnp.transpose(out[:, :kh, :kw, :], (1, 2, 0, 3))

    return dx.astype(x.dtype), dk.astype(k.dtype)


strided_conv2d.defvjp(_fwd, _bwd)


def strided_conv1d(x, k, stride: int, padding):
    """x (B, L, Cin), k (kl, Cin, Cout) -> (B, L', Cout); same custom
    backward via a width-1 2D conv."""
    y = strided_conv2d(
        x[:, :, None, :], k[:, None, :, :], (stride, 1),
        (tuple(padding), (0, 0)),
    )
    return y[:, :, 0, :]


try:  # flax convenience wrapper (ops stays importable without flax)
    import flax.linen as nn

    class FastConv1d(nn.Module):
        """Drop-in for ``nn.Conv(features, (k,), strides=(s,),
        padding=[(p, p)])`` with the custom strided backward. Param
        names (kernel, bias) and layouts match nn.Conv, so checkpoints
        and converters are unaffected."""

        features: int
        kernel_size: int
        stride: int = 1
        padding: tuple = (0, 0)
        use_bias: bool = True

        @nn.compact
        def __call__(self, x):
            cin = x.shape[-1]
            k = self.param(
                "kernel", nn.initializers.lecun_normal(),
                (self.kernel_size, cin, self.features),
            )
            y = strided_conv1d(x, k.astype(x.dtype), self.stride,
                               tuple(self.padding))
            if self.use_bias:
                b = self.param("bias", nn.initializers.zeros,
                               (self.features,))
                y = y + b.astype(y.dtype)
            return y
except ImportError:  # pragma: no cover
    pass
