"""Tests for ops/wiener.py (norbert-style EM Wiener filtering) and the
UMXSeparator niter>0 path (reference remfx/models.py:283-288 wraps the
upstream Separator whose wiener/EM these re-implement)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from remfx_tpu.ops.wiener import _invert, expectation_maximization, wiener


def _rand(key, shape):
    return jax.random.normal(key, shape, dtype=jnp.float32)


def test_invert_2ch_roundtrip():
    rng = np.random.default_rng(0)
    mr = rng.normal(size=(5, 2, 2)).astype(np.float32)
    mi = rng.normal(size=(5, 2, 2)).astype(np.float32)
    inv_r, inv_i = _invert(jnp.asarray(mr), jnp.asarray(mi), eps=0.0)
    m = mr + 1j * mi
    inv = np.asarray(inv_r) + 1j * np.asarray(inv_i)
    prod = np.einsum("bij,bjk->bik", m, inv)
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(2), prod.shape),
                               atol=1e-4)


def test_invert_1ch_roundtrip():
    mr = jnp.asarray([[3.0]]).reshape(1, 1, 1)
    mi = jnp.asarray([[4.0]]).reshape(1, 1, 1)
    inv_r, inv_i = _invert(mr, mi, eps=0.0)
    # (3+4j)^-1 = (3-4j)/25
    np.testing.assert_allclose(float(inv_r[0, 0, 0]), 3 / 25, rtol=1e-5)
    np.testing.assert_allclose(float(inv_i[0, 0, 0]), -4 / 25, rtol=1e-5)


def test_wiener_niter0_is_mixture_phase():
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    F, B, C, S = 7, 11, 1, 1
    xr, xi = _rand(k1, (F, B, C)), _rand(k2, (F, B, C))
    tm = jnp.abs(_rand(k3, (F, B, C, S)))
    yr, yi = wiener(tm, xr, xi, niter=0)
    norm = jnp.sqrt(xr * xr + xi * xi)
    np.testing.assert_allclose(
        np.asarray(yr[..., 0]), np.asarray(tm[..., 0] * xr / norm),
        atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(yi[..., 0]), np.asarray(tm[..., 0] * xi / norm),
        atol=1e-5)


def test_wiener_softmask_sums_to_mix():
    key = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(key, 3)
    F, B, C, S = 5, 9, 1, 3
    xr, xi = _rand(k1, (F, B, C)), _rand(k2, (F, B, C))
    tm = jnp.abs(_rand(k3, (F, B, C, S))) + 0.1
    yr, yi = wiener(tm, xr, xi, niter=0, softmask=True)
    np.testing.assert_allclose(np.asarray(yr.sum(-1)), np.asarray(xr), atol=1e-4)
    np.testing.assert_allclose(np.asarray(yi.sum(-1)), np.asarray(xi), atol=1e-4)


def test_wiener_single_target_requires_residual():
    F, B, C = 4, 6, 1
    tm = jnp.ones((F, B, C, 1))
    x = jnp.ones((F, B, C))
    with pytest.raises(ValueError):
        wiener(tm, x, x, niter=1, residual=False)


def test_em_preserves_disjoint_sources():
    """Two sources with disjoint frequency support and exact magnitude
    estimates: EM should keep each estimate close to the true source."""
    rng = np.random.default_rng(3)
    F, B, C = 64, 16, 1
    s1 = np.zeros((F, B, C), dtype=np.complex64)
    s2 = np.zeros((F, B, C), dtype=np.complex64)
    s1[:, : B // 2] = (rng.normal(size=(F, B // 2, C))
                       + 1j * rng.normal(size=(F, B // 2, C)))
    s2[:, B // 2:] = (rng.normal(size=(F, B // 2, C))
                      + 1j * rng.normal(size=(F, B // 2, C)))
    mix = s1 + s2
    tm = jnp.asarray(np.stack([np.abs(s1), np.abs(s2)], axis=-1),
                     dtype=jnp.float32)
    xr = jnp.asarray(mix.real, dtype=jnp.float32)
    xi = jnp.asarray(mix.imag, dtype=jnp.float32)
    yr, yi = jax.jit(
        lambda tm, xr, xi: wiener(tm, xr, xi, niter=2, wiener_win_len=None)
    )(tm, xr, xi)
    est1 = np.asarray(yr[..., 0]) + 1j * np.asarray(yi[..., 0])
    err = np.linalg.norm(est1 - s1) / np.linalg.norm(s1)
    assert np.isfinite(np.asarray(yr)).all() and np.isfinite(np.asarray(yi)).all()
    assert err < 0.15, f"EM degraded a perfect disjoint estimate: {err:.3f}"


def test_em_windowing_matches_unwindowed_on_exact_multiple():
    """wiener_win_len that divides n_frames must give identical results to
    manual per-window EM (windows are statistically independent)."""
    key = jax.random.PRNGKey(4)
    k1, k2, k3 = jax.random.split(key, 3)
    F, B, C, S = 20, 8, 1, 2
    xr, xi = _rand(k1, (F, B, C)), _rand(k2, (F, B, C))
    tm = jnp.abs(_rand(k3, (F, B, C, S))) + 0.05
    yr_a, yi_a = wiener(tm, xr, xi, niter=1, wiener_win_len=10)
    halves = [
        wiener(tm[s], xr[s], xi[s], niter=1, wiener_win_len=None)
        for s in (slice(0, 10), slice(10, 20))
    ]
    yr_b = jnp.concatenate([h[0] for h in halves], axis=0)
    yi_b = jnp.concatenate([h[1] for h in halves], axis=0)
    np.testing.assert_allclose(np.asarray(yr_a), np.asarray(yr_b), atol=2e-4)
    np.testing.assert_allclose(np.asarray(yi_a), np.asarray(yi_b), atol=2e-4)


def test_umx_separator_niter1_runs():
    from remfx_tpu.models import make_model

    wrapper = make_model("umx", niter=1, residual=True, wiener_win_len=50)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 1, 8192))
    variables = wrapper.module.init(jax.random.PRNGKey(6), x)
    y = wrapper.module.apply(variables, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
