"""Mel filterbanks + mel spectrogram (torchaudio-compatible).

Parity target: ``torchaudio.transforms.MelSpectrogram`` with its defaults
(power=2.0, htk mel scale, norm=None, f_min=0, f_max=sr/2, hann window,
center=True/reflect) as used by the Cnn14 classifier (reference
remfx/classifier.py:156-161).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from remfx_tpu.ops.stft import hann_window, stft_ri


def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


def melscale_fbanks(
    n_freqs: int,
    n_mels: int,
    sample_rate: float,
    f_min: float = 0.0,
    f_max: float | None = None,
) -> np.ndarray:
    """Triangular mel filterbank (n_freqs, n_mels), htk scale, no norm —
    identical math to torchaudio.functional.melscale_fbanks defaults."""
    f_max = sample_rate / 2.0 if f_max is None else f_max
    all_freqs = np.linspace(0.0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    f_pts = mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels+1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


class MelSpectrogram:
    """Callable mel spectrogram: (..., T) -> (..., n_mels, n_frames)."""

    def __init__(
        self,
        sample_rate: float,
        n_fft: int = 1024,
        hop_length: int = 256,
        n_mels: int = 128,
        power: float = 2.0,
    ):
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.power = power
        # Keep constants as *numpy* arrays: jnp closure constants captured
        # into a jit trace are pathologically slow on the target backend
        # (see PERF_NOTES.md); np-origin constants embed cleanly. Built
        # with pure numpy so construction also works inside a trace.
        n = np.arange(n_fft)
        self.window = (0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft))).astype(
            np.float32
        )
        self.fb = melscale_fbanks(n_fft // 2 + 1, n_mels, sample_rate)

    def __call__(self, x: jax.Array) -> jax.Array:
        # constants follow the caller's compute dtype: f32 filterbank/
        # window operands would promote the whole downstream CNN to f32
        # under the bf16 inference policy
        window = jnp.asarray(self.window).astype(x.dtype)
        re, im = stft_ri(x, self.n_fft, self.hop_length, window)
        power = re * re + im * im  # |X|^2 directly (self.power == 2.0)
        if self.power != 2.0:
            power = power ** (self.power / 2.0)
        mel = jnp.einsum("...fn,fm->...mn", power,
                         jnp.asarray(self.fb).astype(x.dtype))
        return mel
