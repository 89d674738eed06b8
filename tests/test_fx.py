"""Golden-parity tests: JAX effect renderers vs the independent C++
sequential oracle (native/refdsp.cpp, JUCE/pedalboard semantics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from remfx_tpu.compat import native_oracle as oracle
from remfx_tpu.fx import make_effect
from remfx_tpu.fx import chorus as chorus_mod
from remfx_tpu.fx import compressor as comp_mod
from remfx_tpu.fx import delay as delay_mod
from remfx_tpu.fx import distortion as dist_mod
from remfx_tpu.fx import reverb as reverb_mod

SR = 48000
T = 48000  # 1 s keeps CPU-side FFT oracle tests quick


@pytest.fixture
def audio(rng):
    # band-limited-ish noise with an envelope, peak ~0.5
    x = rng.standard_normal(T).astype(np.float32)
    x = np.convolve(x, np.ones(8) / 8.0, mode="same")
    x *= 0.5 / np.abs(x).max()
    return x.astype(np.float32)


def test_distortion_matches_oracle(audio):
    params = {"drive_db": jnp.float32(15.0)}
    y = np.asarray(dist_mod.render(jnp.asarray(audio[None]), params, SR))[0]
    ref = oracle.distortion(audio, 15.0)
    np.testing.assert_allclose(y, ref, atol=2e-6)


@pytest.mark.parametrize("delay_s,fb,mix", [(0.11, 0.3, 0.35), (0.25, 0.55, 0.7)])
def test_delay_matches_oracle(audio, delay_s, fb, mix):
    eff = delay_mod.make(SR, max_delay_sconds=0.3)
    params = {
        "delay_seconds": jnp.float32(delay_s),
        "feedback": jnp.float32(fb),
        "mix": jnp.float32(mix),
    }
    y = np.asarray(eff.render(jnp.asarray(audio[None]), params))[0]
    ref = oracle.delay(audio, SR, delay_s, fb, mix)
    assert np.max(np.abs(y - ref)) < 2e-4


def test_compressor_matches_oracle(audio):
    params = {
        "threshold_db": jnp.float32(-30.0),
        "ratio": jnp.float32(4.0),
        "attack_ms": jnp.float32(5.0),
        "release_ms": jnp.float32(100.0),
    }
    y = np.asarray(comp_mod.render(jnp.asarray(audio[None]), params, SR))[0]
    ref = oracle.compressor(audio, SR, -30.0, 4.0, 5.0, 100.0)
    assert np.max(np.abs(y - ref)) < 1e-4


def test_compressor_fast_attack_edge(audio):
    # attack below JUCE's 1e-3 ms limit -> cte = 0 (instant)
    params = {
        "threshold_db": jnp.float32(-20.0),
        "ratio": jnp.float32(1000.0),
        "attack_ms": jnp.float32(1e-4),
        "release_ms": jnp.float32(50.0),
    }
    y = np.asarray(comp_mod.render(jnp.asarray(audio[None]), params, SR))[0]
    ref = oracle.compressor(audio, SR, -20.0, 1000.0, 1e-4, 50.0)
    assert np.max(np.abs(y - ref)) < 1e-4


@pytest.mark.parametrize("room,damp,wet,width", [(0.4, 0.5, 0.3, 0.7), (0.2, 0.9, 0.6, 0.0)])
def test_reverb_matches_oracle(audio, room, damp, wet, width):
    eff = reverb_mod.make(SR, max_room_size=0.5)
    params = {
        "room_size": jnp.float32(room),
        "damping": jnp.float32(damp),
        "wet_dry": jnp.float32(wet),
        "width": jnp.float32(width),
    }
    y = np.asarray(eff.render(jnp.asarray(audio[None]), params))[0]
    ref = oracle.reverb_mono(audio, SR, room, damp, wet, 1.0 - wet, width)
    assert np.max(np.abs(y - ref)) < 5e-4


def test_chorus_matches_oracle(audio):
    eff = chorus_mod.make(SR)
    params = {
        "rate_hz": jnp.float32(1.0),
        "depth": jnp.float32(0.4),
        "centre_delay_ms": jnp.float32(7.0),
        "feedback": jnp.float32(0.3),
        "mix": jnp.float32(0.4),
    }
    y = np.asarray(eff.render(jnp.asarray(audio[None]), params))[0]
    ref = oracle.chorus(audio, SR, 1.0, 0.4, 7.0, 0.3, 0.4)
    assert np.max(np.abs(y - ref)) < 2e-4


def test_limiter_matches_oracle(audio):
    from remfx_tpu.fx.dynamics import limiter_render

    params = {"threshold_db": jnp.float32(-12.0), "release_ms": jnp.float32(80.0)}
    y = np.asarray(limiter_render(jnp.asarray(audio[None]), params, SR))[0]
    ref = oracle.limiter(audio, SR, -12.0, 80.0)
    assert np.max(np.abs(y - ref)) < 1e-4


def test_eq_random_roundtrip(audio, rng):
    # statistical sanity: random EQ keeps signal finite and bounded, and a
    # flat EQ (0 dB everywhere) is identity
    from remfx_tpu.fx import eq as eq_mod

    flat = {
        "low_shelf_gain_db": jnp.float32(0.0),
        "low_shelf_cutoff_freq": jnp.float32(100.0),
        "low_shelf_q_factor": jnp.float32(0.7),
        "high_shelf_gain_db": jnp.float32(0.0),
        "high_shelf_cutoff_freq": jnp.float32(10000.0),
        "high_shelf_q_factor": jnp.float32(0.7),
        "band_gains_db": jnp.zeros(3),
        "band_cutoff_freqs": jnp.asarray([1000.0, 2000.0, 4000.0]),
        "band_q_factors": jnp.asarray([0.7, 0.7, 0.7]),
    }
    y = np.asarray(eq_mod.render(jnp.asarray(audio[None]), flat, SR))[0]
    assert np.max(np.abs(y - audio)) < 1e-4


def test_eq_matches_scipy_cascade(audio):
    import scipy.signal

    from remfx_tpu.fx import eq as eq_mod
    from remfx_tpu.ops.biquad import biquad_coeffs

    params = {
        "low_shelf_gain_db": jnp.float32(-4.0),
        "low_shelf_cutoff_freq": jnp.float32(60.0),
        "low_shelf_q_factor": jnp.float32(0.8),
        "high_shelf_gain_db": jnp.float32(3.0),
        "high_shelf_cutoff_freq": jnp.float32(9000.0),
        "high_shelf_q_factor": jnp.float32(1.2),
        "band_gains_db": jnp.asarray([4.0, -5.0, 2.0]),
        "band_cutoff_freqs": jnp.asarray([1500.0, 3000.0, 7000.0]),
        "band_q_factors": jnp.asarray([0.5, 2.0, 1.0]),
    }
    y = np.asarray(eq_mod.render(jnp.asarray(audio[None]), params, SR))[0]
    ref = audio.astype(np.float64)
    specs = [
        (-4.0, 60.0, 0.8, "low_shelf"),
        (4.0, 1500.0, 0.5, "peaking"),
        (-5.0, 3000.0, 2.0, "peaking"),
        (2.0, 7000.0, 1.0, "peaking"),
        (3.0, 9000.0, 1.2, "high_shelf"),
    ]
    for g, fc, q, t in specs:
        b, a = biquad_coeffs(g, fc, q, SR, t)
        ref = scipy.signal.lfilter(np.asarray(b, np.float64), np.asarray(a, np.float64), ref)
    assert np.max(np.abs(y - ref)) < 2e-3


def test_random_effect_wrappers_run(audio):
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(audio[None])
    for name in ["distortion", "compressor", "delay", "chorus", "reverb",
                 "parametric_eq", "limiter", "volume_automation"]:
        eff = make_effect(name, SR)
        y = eff(key, x)
        assert y.shape == x.shape, name
        assert bool(jnp.all(jnp.isfinite(y))), name


def test_widener_and_chain(audio):
    from remfx_tpu.fx import RandomAudioEffectsChannel, make_effect

    x2 = jnp.stack([jnp.asarray(audio), jnp.asarray(audio) * 0.8])
    w = make_effect("stereo_widener", SR)
    y = w(jax.random.PRNGKey(1), x2)
    assert y.shape == x2.shape
    chan = RandomAudioEffectsChannel(SR)
    out = chan(jax.random.PRNGKey(2), x2)
    assert out.shape == x2.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_volume_automation_semantics(audio):
    from remfx_tpu.fx.dynamics import volume_render

    # single full-length segment 0 -> +6 dB: gain ramps linearly in dB
    params = {
        "num_segments": jnp.int32(1),
        "fractions": jnp.asarray([1.0, 0.0, 0.0]),
        "end_gains_db": jnp.asarray([6.0, 0.0, 0.0]),
    }
    y = np.asarray(volume_render(jnp.asarray(audio[None]), params, SR))[0]
    expected_last = audio[-1] * 10 ** (6.0 / 20.0)
    assert abs(y[0] - audio[0]) < 1e-5
    assert abs(y[-1] - expected_last) < 1e-3


def test_sox_reverb_runs_and_decays(audio):
    from remfx_tpu.fx import sox_reverb

    eff = sox_reverb.make(SR, max_room_scale=50.0)
    params = {
        "reverberance": jnp.float32(60.0),
        "high_freq_damping": jnp.float32(50.0),
        "room_scale": jnp.float32(40.0),
        "stereo_depth": jnp.float32(50.0),
        "wet_dry": jnp.float32(0.5),
        "pre_delay": jnp.float32(20.0),
    }
    y = np.asarray(eff.render(jnp.asarray(audio[None]), params))[0]
    assert np.isfinite(y).all()
    # wet_dry=0 must be identity
    params["wet_dry"] = jnp.float32(0.0)
    y0 = np.asarray(eff.render(jnp.asarray(audio[None]), params))[0]
    np.testing.assert_allclose(y0, audio, atol=1e-5)
    # reverb adds a tail: energy after an impulse-ish transient
    imp = np.zeros_like(audio); imp[100] = 1.0
    params["wet_dry"] = jnp.float32(1.0)
    yi = np.asarray(eff.render(jnp.asarray(imp[None]), params))[0]
    assert np.abs(yi[5000:20000]).max() > 1e-4


def test_compressor_batch_render_matches_single(audio):
    import jax as _jax

    eff = comp_mod.make(SR)
    keys = _jax.random.split(_jax.random.PRNGKey(3), 2)
    xb = jnp.stack([jnp.asarray(audio[None]), jnp.asarray(audio[None]) * 0.5])
    params = _jax.vmap(eff.sample_params)(keys)
    yb = comp_mod.render_batch(xb, params, SR)
    for b in range(2):
        p = {k: v[b] for k, v in params.items()}
        y1 = comp_mod.render(xb[b], p, SR)
        np.testing.assert_allclose(np.asarray(yb[b]), np.asarray(y1), atol=1e-5)


def test_volume_fractions_never_nan():
    """Segment fractions must stay finite, non-negative, and sum to 1
    for every key: the log-space Dirichlet (loggamma + masked softmax)
    keeps inactive segments at exactly 0 with no 0/0 renormalization
    hazard even at the small-alpha floor."""
    from remfx_tpu.fx.dynamics import VOLUME_RANGES, volume_sample_params

    ranges = {**VOLUME_RANGES, "min_segments": 1, "max_segments": 1}
    keys = jax.random.split(jax.random.PRNGKey(7), 8192)
    fr = jax.vmap(
        lambda k: volume_sample_params(k, SR, ranges)["fractions"]
    )(keys)
    fr = np.asarray(fr)
    assert np.isfinite(fr).all()
    assert (fr >= 0).all()
    np.testing.assert_allclose(fr.sum(axis=-1), 1.0, rtol=1e-5)


def test_chorus_chunk_size_rejects_zero_delay_ranges():
    """max_depth >= 2 lets the modulated delay reach 0 at the LFO trough;
    the chunked renderer must reject such ranges, not silently read
    stale zeros."""
    with pytest.raises(ValueError, match="chorus"):
        chorus_mod.chunk_size(
            {**chorus_mod.DEFAULT_RANGES, "max_depth": 2.0}, SR)
