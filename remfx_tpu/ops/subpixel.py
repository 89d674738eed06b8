"""Transposed conv via phase decomposition + depth-to-space.

On this backend ``lax.conv_transpose`` materializes the lhs-dilated
input (zeros included), wasting ~s_h*s_w of the compute. The exact
equivalent: split the kernel into its s_h*s_w stride phases, run ONE
dense conv producing all phases as channels, then depth-to-space.

Matches ``lax.conv_transpose(x, k, strides, padding="VALID")`` (NHWC /
HWIO, no kernel flip) up to output length (we produce the full
(N-1)*s + K_pad*s grid and crop).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def subpixel_conv_transpose(x, k, strides, precision=None):
    """x: (B, H, W, Cin); k: (kh, kw, Cin, Cout); strides (sh, sw).

    Returns (B, (H-1)*sh + kh, (W-1)*sw + kw, Cout) — identical to
    lax.conv_transpose(..., padding="VALID", transpose_kernel=False).
    """
    kh, kw, cin, cout = k.shape
    sh, sw = strides
    Kh, Kw = -(-kh // sh), -(-kw // sw)
    # lax.conv_transpose (transpose_kernel=False) applies the spatially
    # flipped kernel: y[n] = sum_m x[m] k[K-1-(n - m*s)]
    k = k[::-1, ::-1, :, :]
    # phase kernels: wp[ph, pw][d] = k[d*s + p]; zero-pad to (Kh, Kw)
    kp = jnp.zeros((Kh * sh, Kw * sw, cin, cout), k.dtype)
    kp = kp.at[:kh, :kw].set(k)
    # (Kh, sh, Kw, sw, cin, cout) -> phases last for d2s ordering
    kp = kp.reshape(Kh, sh, Kw, sw, cin, cout)
    # correlation with flipped taps: y_p[i] = sum_d x[i-d] wp[d]
    kp = kp[::-1, :, ::-1, :, :, :]
    kp = jnp.transpose(kp, (0, 2, 4, 1, 3, 5)).reshape(Kh, Kw, cin, sh * sw * cout)
    # window-start alignment: left pad K-1 puts phase index i == output j;
    # right pad 2(K-1) extends i to H-1+(K-1) (kernel tail phases)
    y = jax.lax.conv_general_dilated(
        x,
        kp,
        window_strides=(1, 1),
        padding=[(Kh - 1, 2 * (Kh - 1)), (Kw - 1, 2 * (Kw - 1))],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )  # (B, H+Kh-1, W+Kw-1, sh*sw*cout)
    B, Hp, Wp, _ = y.shape
    y = y.reshape(B, Hp, Wp, sh, sw, cout)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(B, Hp * sh, Wp * sw, cout)
    out_h = (x.shape[1] - 1) * sh + kh
    out_w = (x.shape[2] - 1) * sw + kw
    return y[:, :out_h, :out_w, :]
