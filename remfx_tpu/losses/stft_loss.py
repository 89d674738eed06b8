"""Multi-resolution STFT loss — fused XLA, auraloss-compatible.

Parity target: ``auraloss.freq.MultiResolutionSTFTLoss`` with its defaults
as constructed throughout the reference (remfx/models.py:35-44,289-291...):
fft_sizes [1024, 2048, 512], hop_sizes [120, 240, 50], win_lengths
[600, 1200, 240], hann windows, w_sc = w_log_mag = 1, w_lin_mag = w_phs = 0,
``scale=None`` (so the reference's ``n_bins``/``sample_rate`` kwargs are
inert — reference quirk #12 in SURVEY.md), reduction "mean", and the final
average over resolutions.

Per resolution (auraloss STFTLoss semantics):
    mag = sqrt(clamp(|STFT(x)|^2, min=eps))            eps = 1e-8
    sc  = ||mag_y - mag_x||_F / ||mag_y||_F
    lm  = mean(|log mag_x - log mag_y|)
    loss = sc + lm
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from remfx_tpu.ops.stft import hann_window, stft_ri


def _stft_mag(x, n_fft, hop, window, eps):
    re, im = stft_ri(x, n_fft, hop, window)
    # magnitudes and the downstream norm/log reductions always run in
    # fp32; only the DFT GEMM uses x's (possibly bf16) compute dtype
    re, im = re.astype(jnp.float32), im.astype(jnp.float32)
    return jnp.sqrt(jnp.clip(re * re + im * im, eps, None))


@partial(jax.jit, static_argnames=("n_fft", "hop", "win_length", "w_sc", "w_log_mag"))
def stft_loss(
    x: jax.Array,
    y: jax.Array,
    n_fft: int,
    hop: int,
    win_length: int,
    w_sc: float = 1.0,
    w_log_mag: float = 1.0,
    eps: float = 1e-8,
) -> jax.Array:
    """One-resolution STFT loss between input ``x`` and target ``y``."""
    window = hann_window(win_length, x.dtype)
    mag_x = _stft_mag(x, n_fft, hop, window, eps)
    mag_y = _stft_mag(y, n_fft, hop, window, eps)
    # auraloss computes Frobenius norms over the (freq, time) matrix per
    # batch element, then means the ratio over the batch.
    diff = jnp.sqrt(jnp.sum((mag_y - mag_x) ** 2, axis=(-2, -1)))
    denom = jnp.sqrt(jnp.sum(mag_y**2, axis=(-2, -1)))
    sc = jnp.mean(diff / denom)
    lm = jnp.mean(jnp.abs(jnp.log(mag_x) - jnp.log(mag_y)))
    return w_sc * sc + w_log_mag * lm


DEFAULT_FFT_SIZES = (1024, 2048, 512)
DEFAULT_HOP_SIZES = (120, 240, 50)
DEFAULT_WIN_LENGTHS = (600, 1200, 240)


def multi_resolution_stft_loss(
    x: jax.Array,
    y: jax.Array,
    fft_sizes=DEFAULT_FFT_SIZES,
    hop_sizes=DEFAULT_HOP_SIZES,
    win_lengths=DEFAULT_WIN_LENGTHS,
) -> jax.Array:
    """Mean over resolutions of ``stft_loss`` (auraloss convention).

    ``x``/``y``: (..., T); channels fold into batch like torch.stft usage.
    """
    total = 0.0
    for n_fft, hop, win in zip(fft_sizes, hop_sizes, win_lengths):
        total = total + stft_loss(x, y, n_fft, hop, win)
    return total / len(fft_sizes)


class STFTLoss:
    def __init__(self, fft_size=1024, hop_size=256, win_length=1024):
        self.fft_size, self.hop_size, self.win_length = fft_size, hop_size, win_length

    def __call__(self, x, y):
        return stft_loss(x, y, self.fft_size, self.hop_size, self.win_length)


class MultiResolutionSTFTLoss:
    """Drop-in callable mirroring the reference's loss object.

    Accepts and ignores ``n_bins``/``sample_rate`` exactly like auraloss
    does at default ``scale=None`` (reference remfx/models.py:35-37).
    """

    def __init__(
        self,
        fft_sizes=DEFAULT_FFT_SIZES,
        hop_sizes=DEFAULT_HOP_SIZES,
        win_lengths=DEFAULT_WIN_LENGTHS,
        n_bins=None,
        sample_rate=None,
        **_ignored,
    ):
        self.fft_sizes = tuple(fft_sizes)
        self.hop_sizes = tuple(hop_sizes)
        self.win_lengths = tuple(win_lengths)

    def __call__(self, x, y):
        return multi_resolution_stft_loss(
            x, y, self.fft_sizes, self.hop_sizes, self.win_lengths
        )
