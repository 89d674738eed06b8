"""Custom-VJP strided conv (ops/fastconv.py): gradients must equal
plain autodiff; FastConv1d must be param-compatible with nn.Conv."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from remfx_tpu.ops.fastconv import FastConv1d, strided_conv1d, strided_conv2d


@pytest.mark.parametrize(
    "H,W,cin,cout,kh,kw,sh,sw,ph,pw",
    [
        (37, 29, 3, 5, 7, 5, 2, 2, 3, 2),
        (64, 1, 4, 6, 8, 1, 4, 1, 2, 0),
        (33, 17, 2, 3, 5, 3, 2, 1, 2, 1),
    ],
)
def test_strided_conv2d_vjp_matches_autodiff(H, W, cin, cout, kh, kw, sh,
                                             sw, ph, pw):
    k1, k2 = jax.random.split(jax.random.PRNGKey(H))
    x = jax.random.normal(k1, (2, H, W, cin))
    k = jax.random.normal(k2, (kh, kw, cin, cout)) * 0.1
    pad = ((ph, ph), (pw, pw))

    def f_custom(x, k):
        return jnp.sum(jnp.sin(strided_conv2d(x, k, (sh, sw), pad)))

    def f_plain(x, k):
        y = jax.lax.conv_general_dilated(
            x, k, (sh, sw), list(pad),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.sum(jnp.sin(y))

    gx1, gk1 = jax.grad(f_custom, argnums=(0, 1))(x, k)
    gx2, gk2 = jax.grad(f_plain, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2), atol=1e-4)


def test_fastconv1d_matches_nn_conv():
    """Same params, same forward as nn.Conv — converters/ckpts unaffected."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 100, 3))
    fast = FastConv1d(8, 7, 4, (2, 2))
    ref = nn.Conv(8, (7,), strides=(4,), padding=[(2, 2)])
    vf = fast.init(jax.random.PRNGKey(1), x)
    assert set(vf["params"].keys()) == {"kernel", "bias"}
    assert vf["params"]["kernel"].shape == (7, 3, 8)
    y_fast = fast.apply(vf, x)
    y_ref = ref.apply(vf, x)  # identical tree accepted verbatim
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref),
                               atol=1e-5)


def test_strided_conv1d_grad():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 4))
    k = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 6)) * 0.1

    def f(x):
        return jnp.sum(strided_conv1d(x, k, 4, (2, 2)) ** 2)

    g = jax.grad(f)(x)
    # finite-difference spot check
    eps = 1e-3
    idx = (0, 10, 1)
    xp = x.at[idx].add(eps)
    xm = x.at[idx].add(-eps)
    fd = (f(xp) - f(xm)) / (2 * eps)
    assert abs(float(g[idx]) - float(fd)) < 1e-2 * max(1.0, abs(float(fd)))
