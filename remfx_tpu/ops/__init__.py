from remfx_tpu.ops.stft import (
    stft,
    istft,
    stft_ri,
    istft_ri,
    spectrogram,
    hann_window,
    frame,
)
from remfx_tpu.ops.fft import rfft_ri, irfft_ri, fft_pair, cmul, cdiv
from remfx_tpu.ops.biquad import biquad_coeffs, biquad_filter, sosfilt
from remfx_tpu.ops.loudness import integrated_loudness, loudness_normalize
from remfx_tpu.ops.mel import MelSpectrogram, melscale_fbanks
from remfx_tpu.ops.resample import resample

__all__ = [
    "stft",
    "istft",
    "stft_ri",
    "istft_ri",
    "spectrogram",
    "hann_window",
    "frame",
    "rfft_ri",
    "irfft_ri",
    "fft_pair",
    "cmul",
    "cdiv",
    "biquad_coeffs",
    "biquad_filter",
    "sosfilt",
    "integrated_loudness",
    "loudness_normalize",
    "MelSpectrogram",
    "melscale_fbanks",
    "resample",
]
