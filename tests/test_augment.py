"""Chain-renderer semantics: labels, normalization, determinism, vmap,
and switch-vs-dense dispatch equivalence of the label distributions."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from remfx_tpu import ALL_EFFECTS
from remfx_tpu.augment import EffectChainRenderer
from remfx_tpu.ops.loudness import integrated_loudness

SR = 48000
T = 24000


def _chunk(rng):
    x = rng.standard_normal((1, T)).astype(np.float32)
    x *= 0.3 / np.abs(x).max()
    return jnp.asarray(x)


def _renderer(**kw):
    defaults = dict(
        sample_rate=SR,
        effects_to_keep=("distortion",),
        effects_to_remove=("distortion", "compressor"),
        num_kept_effects=(0, 1),
        num_removed_effects=(1, 2),
        shuffle_kept_effects=True,
        shuffle_removed_effects=False,
        effect_overrides={},
        stft_check=False,
    )
    defaults.update(kw)
    return EffectChainRenderer(**defaults)


def test_render_shapes_and_labels(rng):
    r = _renderer(dispatch="switch")
    dry, wet, dl, wl = r.render(jax.random.PRNGKey(0), _chunk(rng))
    assert dry.shape == wet.shape == (1, T)
    assert dl.shape == wl.shape == (len(ALL_EFFECTS),)
    # kept labels only ever mark distortion (index 3)
    assert float(dl[0]) == 0.0 and float(dl[1]) == 0.0
    # removed: 1-2 of {distortion, compressor}
    assert 1.0 <= float(wl.sum()) <= 2.0
    assert float(wl[0]) == 0.0 and float(wl[1]) == 0.0 and float(wl[2]) == 0.0


def test_render_is_deterministic(rng):
    r = _renderer(dispatch="switch")
    x = _chunk(rng)
    a = r.render(jax.random.PRNGKey(7), x)
    b = r.render(jax.random.PRNGKey(7), x)
    for u, v in zip(a, b):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))


def test_render_normalizes_loudness(rng):
    r = _renderer(dispatch="switch")
    dry, wet, _, _ = r.render(jax.random.PRNGKey(3), _chunk(rng))
    assert abs(float(integrated_loudness(dry, SR)) + 20.0) < 0.1
    assert abs(float(integrated_loudness(wet, SR)) + 20.0) < 0.1


@pytest.mark.parametrize("dispatch", ["switch", "dense"])
def test_render_batch(rng, dispatch):
    r = _renderer(dispatch=dispatch)
    xb = jnp.stack([_chunk(rng) for _ in range(3)])
    dry, wet, dl, wl = r.render_batch(jax.random.PRNGKey(1), xb)
    assert dry.shape == (3, 1, T) and wl.shape == (3, len(ALL_EFFECTS))
    assert bool(jnp.all(jnp.isfinite(wet)))
    wl = np.asarray(wl)
    assert ((wl.sum(axis=1) >= 1) & (wl.sum(axis=1) <= 2)).all()
    # normalized loudness per example
    assert abs(float(integrated_loudness(wet[0], SR)) + 20.0) < 0.1
    # different examples get different effect draws (overwhelmingly likely)
    assert not np.allclose(np.asarray(wet[0]), np.asarray(wet[1]))


def test_dense_matches_switch_distribution(rng):
    # statistical check: label marginals from both dispatches agree
    kw = dict(
        effects_to_keep=(),
        effects_to_remove=("distortion", "compressor"),
        num_kept_effects=(0, 0),
        num_removed_effects=(0, 2),
        shuffle_removed_effects=True,
        stft_check=False,
    )
    xb = jnp.stack([_chunk(rng) for _ in range(16)])
    _, _, _, wl_s = _renderer(dispatch="switch", **kw).render_batch(
        jax.random.PRNGKey(0), xb
    )
    _, _, _, wl_d = _renderer(dispatch="dense", **kw).render_batch(
        jax.random.PRNGKey(0), xb
    )
    for wl in (wl_s, wl_d):
        wl = np.asarray(wl)
        assert wl[:, :3].sum() == wl[:, :2].sum() == 0  # only dist/comp... (idx 3,4)
        assert (wl.sum(axis=1) <= 2).all()


def test_zero_removed_gives_equal_wet_dry(rng):
    r = _renderer(num_removed_effects=(0, 0), num_kept_effects=(1, 1),
                  dispatch="dense")
    xb = _chunk(rng)[None]
    dry, wet, dl, wl = r.render_batch(jax.random.PRNGKey(2), xb)
    np.testing.assert_allclose(np.asarray(dry), np.asarray(wet), atol=1e-7)
    assert float(np.asarray(wl).sum()) == 0.0 and float(np.asarray(dl).sum()) == 1.0


@pytest.mark.parametrize("dispatch", ["switch", "dense"])
def test_stft_redraw_loop(rng, dispatch):
    r = _renderer(stft_check=True, max_redraws=2, dispatch=dispatch)
    xb = _chunk(rng)[None]
    dry, wet, _, wl = r.render_batch(jax.random.PRNGKey(5), xb)
    assert bool(jnp.all(jnp.isfinite(wet)))
