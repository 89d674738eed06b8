"""Golden tests for DSP foundations: STFT vs torch.stft, biquads vs scipy,
LUFS vs an independent numpy BS.1770 implementation, wav IO roundtrip,
resampler parity.
"""

import numpy as np
import pytest
import scipy.signal
import torch

import jax
import jax.numpy as jnp

from remfx_tpu.data.wav import read_wav, write_wav
from remfx_tpu.ops import (
    biquad_coeffs,
    biquad_filter,
    hann_window,
    integrated_loudness,
    istft,
    loudness_normalize,
    resample,
    stft,
)
from remfx_tpu.ops.loudness import k_weighting_coeffs
from remfx_tpu.ops.mel import MelSpectrogram, melscale_fbanks


def test_wav_roundtrip_float32(tmp_path, rng):
    x = rng.standard_normal((2, 4801)).astype(np.float32) * 0.3
    p = tmp_path / "a.wav"
    write_wav(p, x, 48000, dtype="float32")
    y, sr = read_wav(p)
    assert sr == 48000
    np.testing.assert_array_equal(x, y)


def test_wav_roundtrip_int16(tmp_path, rng):
    x = rng.standard_normal((1, 1000)).astype(np.float32) * 0.3
    p = tmp_path / "a.wav"
    write_wav(p, x, 44100, dtype="int16")
    y, sr = read_wav(p)
    assert sr == 44100
    assert np.max(np.abs(x - y)) < 1.0 / 32768.0


def test_wav_reads_reference_example():
    x, sr = read_wav("/root/reference/example.wav")
    assert sr == 48000
    assert x.shape == (1, 262144)
    assert np.abs(x).max() <= 1.0


@pytest.mark.parametrize("n_fft,hop,win", [(1024, 120, 600), (2048, 240, 1200), (512, 50, 240)])
def test_stft_matches_torch(rng, n_fft, hop, win):
    x = rng.standard_normal((3, 8192)).astype(np.float32)
    window = hann_window(win)
    ours = np.asarray(stft(jnp.asarray(x), n_fft, hop, window))
    theirs = torch.stft(
        torch.from_numpy(x),
        n_fft,
        hop_length=hop,
        win_length=win,
        window=torch.hann_window(win),
        return_complex=True,
    ).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=1e-4)


def test_istft_roundtrip(rng):
    x = rng.standard_normal((2, 16384)).astype(np.float32)
    window = hann_window(1024)
    X = stft(jnp.asarray(x), 1024, 256, window)
    y = np.asarray(istft(X, 1024, 256, window, length=16384))
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_istft_matches_torch(rng):
    x = rng.standard_normal((2, 8192)).astype(np.float32)
    n_fft, hop = 512, 128
    window = hann_window(n_fft)
    X = torch.stft(
        torch.from_numpy(x), n_fft, hop, window=torch.hann_window(n_fft),
        return_complex=True,
    )
    ref = torch.istft(X, n_fft, hop, window=torch.hann_window(n_fft), length=8192)
    ours = istft(jnp.asarray(X.numpy()), n_fft, hop, window, length=8192)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-4)


@pytest.mark.parametrize("ftype", ["low_shelf", "high_shelf", "peaking"])
def test_biquad_matches_scipy(rng, ftype):
    x = rng.standard_normal(48000).astype(np.float32) * 0.5
    b, a = biquad_coeffs(4.5, 1000.0, 0.9, 48000, ftype)
    y = np.asarray(biquad_filter(b, a, jnp.asarray(x)))
    ref = scipy.signal.lfilter(np.asarray(b, np.float64), np.asarray(a, np.float64), x)
    np.testing.assert_allclose(y, ref, atol=5e-4, rtol=1e-3)


def test_rfft_ri_matches_numpy(rng):
    from remfx_tpu.ops.fft import rfft_ri

    for n in (512, 4096, 2**18, 2**20):
        x = rng.standard_normal(n).astype(np.float32)
        re, im = rfft_ri(jnp.asarray(x), n)
        ref = np.fft.rfft(x.astype(np.float64))
        scale = np.abs(ref).max()
        assert np.max(np.abs(np.asarray(re) - ref.real)) / scale < 3e-6, n
        assert np.max(np.abs(np.asarray(im) - ref.imag)) / scale < 3e-6, n


def test_irfft_ri_roundtrip(rng):
    from remfx_tpu.ops.fft import irfft_ri, rfft_ri

    for n in (1024, 2**17, 2**20):
        x = rng.standard_normal(n).astype(np.float32)
        re, im = rfft_ri(jnp.asarray(x), n)
        y = np.asarray(irfft_ri(re, im, n))
        assert np.max(np.abs(y - x)) < 2e-5 * np.abs(x).max(), n


def test_fft_lti_low_freq_pole_exact(rng):
    # Low-shelf at 20 Hz has poles near |z|=1 — catastrophic for naive
    # parallel scans; the FFT-domain path must stay exact. This is the
    # path the parametric EQ effect uses.
    from remfx_tpu.ops.fftfilt import (
        apply_lti_ri,
        biquad_response_ri,
        next_pow2,
        rfft_omega,
    )

    x = rng.standard_normal(262144).astype(np.float32) * 0.5
    b, a = biquad_coeffs(-6.0, 20.0, 0.5, 48000, "low_shelf")
    n_fft = next_pow2(2 * 262144)
    z1r, z1i = rfft_omega(n_fft)
    Hr, Hi = biquad_response_ri(b, a, z1r, z1i)
    y = np.asarray(apply_lti_ri(jnp.asarray(x), Hr, Hi, n_fft))
    ref = scipy.signal.lfilter(np.asarray(b, np.float64), np.asarray(a, np.float64), x)
    # f64-FFT wrap error is ~1e-13; the residual here is f32 FFT rounding.
    assert np.max(np.abs(y - ref)) < 1e-3


def test_fft_lti_high_q_peaking(rng):
    from remfx_tpu.ops.fftfilt import (
        apply_lti_ri,
        biquad_response_ri,
        next_pow2,
        rfft_omega,
    )

    x = rng.standard_normal(262144).astype(np.float32) * 0.5
    b, a = biquad_coeffs(6.0, 1000.0, 4.0, 48000, "peaking")
    n_fft = next_pow2(2 * 262144)
    z1r, z1i = rfft_omega(n_fft)
    Hr, Hi = biquad_response_ri(b, a, z1r, z1i)
    y = np.asarray(apply_lti_ri(jnp.asarray(x), Hr, Hi, n_fft))
    ref = scipy.signal.lfilter(np.asarray(b, np.float64), np.asarray(a, np.float64), x)
    assert np.max(np.abs(y - ref)) < 5e-3


def _numpy_bs1770(x, rate):
    """Independent numpy BS.1770 (pyloudnorm-default semantics) oracle."""
    (b1, a1), (b2, a2) = [
        (np.asarray(b, np.float64), np.asarray(a, np.float64))
        for b, a in k_weighting_coeffs(rate)
    ]
    y = scipy.signal.lfilter(b2, a2, scipy.signal.lfilter(b1, a1, x, axis=-1), axis=-1)
    t_g, step = 0.4, 0.25
    T = x.shape[-1] / rate
    num_blocks = int(np.round((T - t_g) / (t_g * step))) + 1
    z = []
    for j in range(num_blocks):
        lo = int(t_g * (j * step) * rate)
        hi = int(t_g * (j * step + 1) * rate)
        z.append(np.sum(np.square(y[..., lo:hi]), axis=-1) / (t_g * rate))
    z = np.stack(z, axis=-1)  # (C, J)
    power = z.sum(axis=0) if z.ndim == 2 else z
    with np.errstate(divide="ignore"):
        l_j = -0.691 + 10 * np.log10(power)
    j_a = l_j >= -70.0
    if not j_a.any():
        return -np.inf
    gamma_r = -0.691 + 10 * np.log10(power[j_a].mean()) - 10.0
    j_g = (l_j > gamma_r) & (l_j > -70.0)
    if not j_g.any():
        return -np.inf
    return -0.691 + 10 * np.log10(power[j_g].mean())


def test_lufs_matches_numpy_reference(rng):
    x = (rng.standard_normal((1, 262144)) * 0.1).astype(np.float32)
    # add some level variation so gating is exercised
    env = np.linspace(0.2, 1.0, 262144)[None, :].astype(np.float32)
    x = x * env
    ours = float(integrated_loudness(jnp.asarray(x), 48000))
    ref = _numpy_bs1770(x.astype(np.float64), 48000)
    assert abs(ours - ref) < 0.05  # LUFS


def test_lufs_sine_level():
    # -20 dBFS 997 Hz sine: K-weighted loudness should be near -20 + shelf≈0
    t = np.arange(96000) / 48000.0
    x = (0.1 * np.sin(2 * np.pi * 997 * t)).astype(np.float32)[None]
    ours = float(integrated_loudness(jnp.asarray(x), 48000))
    ref = _numpy_bs1770(x.astype(np.float64), 48000)
    assert abs(ours - ref) < 0.05


def test_loudness_normalize_hits_target():
    t = np.arange(262144) / 48000.0
    x = (0.03 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None]
    y = loudness_normalize(jnp.asarray(x), 48000, target_lufs_db=-20.0)
    lufs = float(integrated_loudness(y, 48000))
    assert abs(lufs - (-20.0)) < 0.01


def test_loudness_normalize_silence_clamps():
    x = jnp.zeros((1, 262144), jnp.float32)
    y = loudness_normalize(x, 48000, target_lufs_db=-20.0)
    assert bool(jnp.all(jnp.isfinite(y)))  # gain clamped at +40 dB, 0 stays 0


def test_melscale_fbanks_properties():
    fb = melscale_fbanks(1025, 128, 48000)
    assert fb.shape == (1025, 128)
    assert fb.min() >= 0
    # each filter has unit peak <= 1 and nonzero support
    assert (fb.sum(axis=0) > 0).all()


def test_melspectrogram_shape(rng):
    x = rng.standard_normal((2, 48000)).astype(np.float32)
    mel = MelSpectrogram(48000, n_fft=2048, hop_length=512, n_mels=128)
    m = mel(jnp.asarray(x))
    assert m.shape == (2, 128, 48000 // 512 + 1)
    assert bool(jnp.all(m >= 0))


def _torch_style_resample(x, orig, new):
    """Reimplementation of torchaudio sinc_interp_hann in numpy (oracle)."""
    import math

    gcd = math.gcd(orig, new)
    o, n = orig // gcd, new // gcd
    base = min(o, n) * 0.99
    width = math.ceil(6 * o / base)
    idx = np.arange(-width, width + o, dtype=np.float64)[None, :] / o
    t = np.arange(0, -n, -1, dtype=np.float64)[:, None] / n + idx
    t *= base
    t = np.clip(t, -6, 6)
    window = np.cos(t * np.pi / 6 / 2) ** 2
    t *= np.pi
    kern = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t)) * window * (base / o)
    xp = np.pad(x, [(0, 0), (width, width + o)])
    frames = []
    T = x.shape[-1]
    n_frames = int(np.ceil((xp.shape[-1] - kern.shape[-1] + 1) / o))
    out = np.zeros((x.shape[0], n_frames, n))
    for f in range(n_frames):
        seg = xp[:, f * o : f * o + kern.shape[-1]]
        out[:, f, :] = seg @ kern.T
    y = out.reshape(x.shape[0], -1)
    del frames
    return y[:, : int(np.ceil(new * T / orig))]


def test_resample_matches_torchaudio_math(rng):
    x = rng.standard_normal((2, 44100)).astype(np.float32)
    y = np.asarray(resample(jnp.asarray(x), 44100, 48000))
    ref = _torch_style_resample(x.astype(np.float64), 44100, 48000)
    assert y.shape == ref.shape
    np.testing.assert_allclose(y, ref, atol=2e-4)


def test_resample_preserves_tone(rng):
    t = np.arange(44100) / 44100.0
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)[None]
    y = np.asarray(resample(jnp.asarray(x), 44100, 48000))[0]
    t2 = np.arange(len(y)) / 48000.0
    ref = np.sin(2 * np.pi * 440 * t2)
    # ignore edges (filter transient)
    assert np.max(np.abs(y[500:-500] - ref[500:-500])) < 1e-2


def test_stft_custom_vjp_matches_autodiff():
    """stft_ri's framing conv carries a custom VJP (overlap-add adjoint;
    the lhs-dilated conv backward is catastrophic on the target backend,
    PERF_NOTES #10) — its gradients must equal plain autodiff."""
    import importlib

    S = importlib.import_module("remfx_tpu.ops.stft")
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(0), (2, 5000), jnp.float32)
    win = S.hann_window(512)

    def with_custom(a):
        re, im = S.stft_ri(a, 512, 128, win)
        return jnp.sum(re**2 * 1.3 + im**2 * 0.7 + re * im)

    def plain_conv(a):
        w = S._pad_window(win, 512)
        ap = jnp.pad(a, [(0, 0), (256, 256)], mode="reflect")
        k = jnp.asarray(S._basis(512)) * jnp.asarray(w)[:, None]
        k = jnp.swapaxes(k, 0, 1)[:, None, :]
        y = jax.lax.conv_general_dilated(
            ap[:, None, :], k, (128,), [(0, 0)],
            dimension_numbers=("NCH", "OIH", "NCH"), precision=S._PREC,
        )
        re, im = y[:, :257, :], y[:, 257:, :]
        return jnp.sum(re**2 * 1.3 + im**2 * 0.7 + re * im)

    v1, g1 = jax.value_and_grad(with_custom)(x)
    v2, g2 = jax.value_and_grad(plain_conv)(x)
    assert abs(float(v1 - v2)) < 1e-3 * abs(float(v2))
    scale = float(jnp.max(jnp.abs(g2)))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-3 * scale)


def test_lufs_fractional_hop_rate(rng):
    """pyloudnorm starts block j at int(j*0.1*sr) (float product truncated
    per block), not j*int(0.1*sr). At sr=11025 the two drift ~j/2 samples;
    the numpy oracle uses the former, so parity here pins the fix."""
    sr = 11025
    x = (rng.standard_normal((1, 4 * sr)) * 0.1).astype(np.float32)
    env = np.linspace(0.2, 1.0, x.shape[-1])[None, :].astype(np.float32)
    x = x * env
    ours = float(integrated_loudness(jnp.asarray(x), sr))
    ref = _numpy_bs1770(x.astype(np.float64), sr)
    assert abs(ours - ref) < 0.05


def test_wiener_zero_mixture_bin_uses_atan2_phase():
    """atan2(0, 0) = 0 upstream: an exactly-zero mixture bin must seed
    EM with (targets_mag, 0), not (0, 0)."""
    from remfx_tpu.ops.wiener import wiener

    F, B, C, S = 4, 1, 2, 2
    mag = jnp.ones((F, B, C, S), jnp.float32)
    xr = jnp.zeros((F, B, C), jnp.float32)
    xi = jnp.zeros((F, B, C), jnp.float32)
    yr, yi = wiener(mag, xr, xi, niter=0)
    np.testing.assert_allclose(np.asarray(yr), 1.0)
    np.testing.assert_allclose(np.asarray(yi), 0.0)
