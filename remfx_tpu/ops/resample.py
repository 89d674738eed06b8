"""Polyphase sinc resampler (torchaudio `sinc_interp_hann`-compatible).

Parity target: ``torchaudio.functional.resample`` defaults
(lowpass_filter_width=6, rolloff=0.99, hann-windowed sinc), used by the
reference for dataset chunk resampling and classifier front-ends
(remfx/utils.py:134, remfx/classifier.py:180-183). Implemented as one
strided conv so XLA maps it onto the MXU.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def _kernel(orig_freq: int, new_freq: int, lowpass_filter_width: int, rolloff: float):
    gcd = math.gcd(orig_freq, new_freq)
    orig, new = orig_freq // gcd, new_freq // gcd
    base_freq = min(orig, new) * rolloff
    width = math.ceil(lowpass_filter_width * orig / base_freq)
    idx = np.arange(-width, width + orig, dtype=np.float64)[None, :] / orig
    t = np.arange(0, -new, -1, dtype=np.float64)[:, None] / new + idx
    t *= base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t *= np.pi
    scale = base_freq / orig
    kernels = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernels *= window * scale
    return kernels.astype(np.float32), width, orig, new  # (new, kw)


@partial(jax.jit, static_argnames=("orig_freq", "new_freq", "lowpass_filter_width", "rolloff"))
def resample(
    x: jax.Array,
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> jax.Array:
    """Resample ``x (..., T)`` from orig_freq to new_freq."""
    if orig_freq == new_freq:
        return x
    kernels, width, orig, new = _kernel(
        int(orig_freq), int(new_freq), lowpass_filter_width, rolloff
    )
    batch_shape = x.shape[:-1]
    length = x.shape[-1]
    xf = x.reshape((-1, 1, length))
    xf = jnp.pad(xf, [(0, 0), (0, 0), (width, width + orig)])
    # kernel follows the caller's compute dtype (bf16 inference stays bf16)
    k = jnp.asarray(kernels)[:, None, :].astype(x.dtype)  # (new, 1, kw)
    y = jax.lax.conv_general_dilated(
        xf,
        k,
        window_strides=(orig,),
        padding=[(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # (B, new, frames)
    y = jnp.swapaxes(y, 1, 2).reshape(batch_shape + (-1,))
    target_length = math.ceil(new * length / orig)
    return y[..., :target_length]
