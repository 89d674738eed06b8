"""ITU-R BS.1770 integrated loudness (LUFS) — in-graph, jittable.

Behavioral parity target: ``pyloudnorm.Meter.integrated_loudness`` with its
default "K-weighting" filter class (used by the reference's
``LoudnessNormalize``, remfx/effects.py:619-629), including its quirks:

  * K-weighting = RBJ high-shelf (G=+4 dB, fc=1500 Hz, Q=1/sqrt(2)) then
    RBJ high-pass (fc=38 Hz, Q=0.5), both designed at the working rate.
  * 400 ms gating blocks with 75% overlap; block count is
    ``round((T - 0.4)/0.1) + 1`` and the final block may run past the end
    of the signal (it is zero-padded, i.e. under-weighted) — exactly as
    pyloudnorm's integer slicing behaves.
  * Absolute gate ``l_j >= -70``; relative gate ``l_j > Gamma_r`` (strict)
    and ``l_j > -70`` (strict); empty gated sets degrade to -inf LUFS via
    masked means, matching pyloudnorm's nan_to_num path.

Everything is static-shape; the filters run through the parallel
associative-scan biquad (ops/biquad.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from remfx_tpu.ops.biquad import biquad_coeffs, biquad_filter


def _highpass_coeffs(cutoff_freq, q_factor, sample_rate):
    """RBJ high-pass (pyloudnorm IIRfilter 'high_pass')."""
    w0 = 2.0 * np.pi * (cutoff_freq / sample_rate)
    alpha = np.sin(w0) / (2.0 * q_factor)
    cos_w0 = np.cos(w0)
    b0 = (1 + cos_w0) / 2
    b1 = -(1 + cos_w0)
    b2 = (1 + cos_w0) / 2
    a0 = 1 + alpha
    a1 = -2 * cos_w0
    a2 = 1 - alpha
    b = np.array([b0, b1, b2]) / a0
    a = np.array([a0, a1, a2]) / a0
    return jnp.asarray(b, jnp.float32), jnp.asarray(a, jnp.float32)


def k_weighting_coeffs(sample_rate: float):
    """(b, a) pairs for the two K-weighting stages at ``sample_rate``."""
    b1, a1 = biquad_coeffs(4.0, 1500.0, 1.0 / np.sqrt(2.0), sample_rate, "high_shelf")
    b2, a2 = _highpass_coeffs(38.0, 0.5, sample_rate)
    return (b1, a1), (b2, a2)


@partial(jax.jit, static_argnames=("sample_rate",))
def integrated_loudness(x: jax.Array, sample_rate: int) -> jax.Array:
    """Integrated LUFS of ``x (channels, T)`` (or (T,) mono). Returns scalar.

    Channel weights are 1.0 (mono/stereo front channels), matching both
    pyloudnorm and the reference's mono-only usage.
    """
    if x.ndim == 1:
        x = x[None, :]
    (kb1, ka1), (kb2, ka2) = k_weighting_coeffs(sample_rate)
    y = biquad_filter(kb1, ka1, x)
    y = biquad_filter(kb2, ka2, y)

    t_g = 0.4
    step = 0.25
    T = x.shape[-1] / sample_rate
    num_blocks = int(np.round((T - t_g) / (t_g * step))) + 1
    if num_blocks < 1:
        # Signal shorter than one 400 ms gating block (never happens at the
        # reference's 5.46 s chunks; pyloudnorm is undefined here). Fall
        # back to ungated loudness over the whole signal.
        power = jnp.sum(jnp.mean(y**2, axis=-1), axis=0)
        return (-0.691 + 10.0 * jnp.log10(power)).astype(jnp.float32)
    block_len = int(t_g * sample_rate)
    # pyloudnorm starts block j at int(j * 0.1 * sr) — the float product
    # truncated PER BLOCK, not j * int(0.1 * sr), which drifts ~j/2
    # samples at rates where 0.1 * sr is fractional (e.g. 11025)
    starts = (np.arange(num_blocks) * (t_g * step * sample_rate)).astype(
        np.int64)
    # final block may overrun: zero-pad (== pyloudnorm's truncated slice sum)
    needed = int(starts[-1]) + block_len
    pad = max(0, needed - y.shape[-1])
    yp = jnp.pad(y, [(0, 0), (0, pad)])
    idx = starts[:, None] + np.arange(block_len)[None, :]
    blocks = yp[:, idx]  # (C, num_blocks, block_len)
    z = jnp.sum(blocks**2, axis=-1) / (t_g * sample_rate)  # (C, J)

    eps = 0.0  # pyloudnorm uses raw log10; -inf propagates by design
    del eps
    power = jnp.sum(z, axis=0)  # channel weights 1.0
    l_j = -0.691 + 10.0 * jnp.log10(power)  # may be -inf for silence

    gate_a = l_j >= -70.0
    n_a = jnp.sum(gate_a)
    z_avg_a = jnp.where(
        n_a > 0, jnp.sum(jnp.where(gate_a, power, 0.0)) / jnp.maximum(n_a, 1), 0.0
    )
    gamma_r = -0.691 + 10.0 * jnp.log10(z_avg_a) - 10.0

    gate = (l_j > gamma_r) & (l_j > -70.0)
    n_g = jnp.sum(gate)
    z_avg = jnp.where(
        n_g > 0, jnp.sum(jnp.where(gate, power, 0.0)) / jnp.maximum(n_g, 1), 0.0
    )
    return (-0.691 + 10.0 * jnp.log10(z_avg)).astype(jnp.float32)


def loudness_normalize(
    x: jax.Array, sample_rate: int, target_lufs_db: float = -32.0
) -> jax.Array:
    """Gain ``x`` to the target integrated loudness.

    Matches the reference's ``LoudnessNormalize`` including the gain-delta
    clamp to [-120, 40] dB (remfx/effects.py:625-629).
    """
    lufs = integrated_loudness(x, sample_rate)
    delta = jnp.clip(target_lufs_db - lufs, -120.0, 40.0)
    gain = 10.0 ** (delta / 20.0)
    return gain * x
