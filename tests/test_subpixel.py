"""Subpixel transposed-conv equivalence vs lax.conv_transpose."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from remfx_tpu.ops.subpixel import subpixel_conv_transpose


@pytest.mark.parametrize(
    "kh,kw,sh,sw", [(5, 3, 2, 2), (7, 5, 2, 1), (4, 4, 2, 2), (3, 3, 1, 1), (8, 1, 4, 1)]
)
def test_matches_lax_conv_transpose(rng, kh, kw, sh, sw):
    x = jnp.asarray(rng.standard_normal((2, 6, 7, 3)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((kh, kw, 3, 4)).astype(np.float32))
    ref = jax.lax.conv_transpose(
        x, k, strides=(sh, sw), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = subpixel_conv_transpose(x, k, (sh, sw))
    assert ref.shape == out.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
