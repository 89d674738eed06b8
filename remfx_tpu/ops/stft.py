"""STFT / iSTFT / spectrogram — pure JAX, fused under jit, complex-free.

Semantics match ``torch.stft`` / ``torch.istft`` with their defaults
(center=True, pad_mode='reflect', onesided), which is what the reference
stack uses throughout (reference remfx/utils.py:138-159, auraloss STFT
losses, torchaudio MelSpectrogram).

The target TPU backend has no complex dtype, so the core API is the
``(re, im)`` pair form (``stft_ri``/``istft_ri``) computed with MXU
matmul DFTs (ops/fft.py). Thin complex wrappers (``stft``/``istft``)
exist for CPU-side tests and tooling.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from remfx_tpu.ops.fft import irfft_ri, rfft_ri


def hann_window(win_length: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window, identical to ``torch.hann_window``."""
    n = np.arange(win_length)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))
    return jnp.asarray(w, dtype=dtype)


def _pad_window(window: jax.Array, n_fft: int) -> jax.Array:
    """Center-pad a window of length win_length to n_fft (torch.stft rule)."""
    win_length = window.shape[0]
    if win_length == n_fft:
        return window
    left = (n_fft - win_length) // 2
    return jnp.pad(window, (left, n_fft - win_length - left))


def frame(x: jax.Array, frame_length: int, hop: int) -> jax.Array:
    """Slice ``x (..., T)`` into overlapping frames ``(..., n_frames, frame_length)``."""
    t = x.shape[-1]
    n_frames = 1 + (t - frame_length) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame_length)[None, :]
    return x[..., idx]


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "center", "pad_mode"))
def stft_ri(
    x: jax.Array,
    n_fft: int,
    hop_length: int,
    window: jax.Array,
    center: bool = True,
    pad_mode: str = "reflect",
):
    """STFT of ``x (..., T)`` -> (re, im), each ``(..., n_fft//2+1, n_frames)``.

    Matches torch.stft(..., return_complex=True) split into re/im planes.
    """
    window = _pad_window(window, n_fft)
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode=pad_mode)
    frames = frame(x, n_fft, hop_length)  # (..., n_frames, n_fft)
    re, im = rfft_ri(frames * window, n_fft)  # (..., n_frames, n_freq)
    return jnp.swapaxes(re, -1, -2), jnp.swapaxes(im, -1, -2)


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "center", "length"))
def istft_ri(
    re: jax.Array,
    im: jax.Array,
    n_fft: int,
    hop_length: int,
    window: jax.Array,
    center: bool = True,
    length: int | None = None,
) -> jax.Array:
    """Inverse STFT (torch.istft semantics, NOLA-normalized overlap-add).

    ``re``/``im``: (..., n_freq, n_frames) -> (..., T) real.
    """
    window = _pad_window(window, n_fft)
    frames = irfft_ri(
        jnp.swapaxes(re, -1, -2), jnp.swapaxes(im, -1, -2), n_fft
    )
    frames = frames * window  # (..., n_frames, n_fft)
    n_frames = frames.shape[-2]
    out_len = n_fft + hop_length * (n_frames - 1)

    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    flat_idx = jnp.asarray(idx.reshape(-1))
    batch_shape = frames.shape[:-2]
    flat = frames.reshape(batch_shape + (-1,))
    y = jnp.zeros(batch_shape + (out_len,), frames.dtype)
    y = y.at[..., flat_idx].add(flat)

    # window-square normalization envelope
    wsq = jnp.zeros((out_len,), frames.dtype)
    wsq = wsq.at[flat_idx].add(jnp.tile(window**2, n_frames))
    y = y / jnp.where(wsq > 1e-11, wsq, 1.0)

    if center:
        pad = n_fft // 2
        y = y[..., pad : out_len - pad]
    if length is not None:
        t = y.shape[-1]
        if t >= length:
            y = y[..., :length]
        else:
            y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, length - t)])
    return y


def stft(
    x: jax.Array,
    n_fft: int,
    hop_length: int,
    window: jax.Array,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jax.Array:
    """Complex-output wrapper over ``stft_ri`` (CPU/tests; the target TPU
    backend has no complex dtype — use ``stft_ri`` in device code)."""
    re, im = stft_ri(x, n_fft, hop_length, window, center, pad_mode)
    return jax.lax.complex(re, im)


def istft(
    spec: jax.Array,
    n_fft: int,
    hop_length: int,
    window: jax.Array,
    center: bool = True,
    length: int | None = None,
) -> jax.Array:
    """Complex-input wrapper over ``istft_ri`` (CPU/tests only)."""
    return istft_ri(
        jnp.real(spec), jnp.imag(spec), n_fft, hop_length, window, center, length
    )


def spectrogram(
    x: jax.Array,
    window: jax.Array,
    n_fft: int,
    hop_length: int,
    alpha: float,
) -> jax.Array:
    """Compressed-magnitude spectrogram ``|X|^alpha`` (reference
    remfx/utils.py:138-159; alpha=0.3 for the UMX wrapper)."""
    re, im = stft_ri(x, n_fft, hop_length, window)
    return jnp.power(jnp.sqrt(re * re + im * im) + 1e-8, alpha)
