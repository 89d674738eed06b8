"""Mixed-precision (bf16 compute / fp32 master weights) training policy."""

import jax
import jax.numpy as jnp
import numpy as np

from remfx_tpu.models import make_model
from remfx_tpu.train.tasks import RemovalTask

SR = 48000
T = 8192
B = 2


def _task(precision):
    w = make_model("tcn", sample_rate=SR, nblocks=3, channel_width=8,
                   kernel_size=3, dilation_growth=2)
    return RemovalTask(w, max_steps=100, precision=precision)


def test_bf16_mixed_step_keeps_fp32_master_weights(rng):
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rng.standard_normal((B, 1, T)).astype(np.float32) * 0.1)
    y = 0.9 * x
    task32 = _task("32")
    task16 = _task("bf16-mixed")
    s32 = task32.init_state(key, x)
    s16 = task16.init_state(key, x)

    before = [np.asarray(a) for a in jax.tree.leaves(s16.params)]
    s16b, m16 = task16.train_step(s16, (x, y), key)  # donates s16
    # master weights stay fp32 and actually moved
    for leaf in jax.tree.leaves(s16b.params):
        assert leaf.dtype == jnp.float32
    moved = any(
        not np.allclose(a, np.asarray(b))
        for a, b in zip(before, jax.tree.leaves(s16b.params))
    )
    assert moved
    # bf16 loss within a few percent of fp32 loss on the same batch
    _, m32 = task32.train_step(s32, (x, y), key)
    l32, l16 = float(m32["train_loss"]), float(m16["train_loss"])
    assert np.isfinite(l16)
    assert abs(l16 - l32) / abs(l32) < 0.05, (l16, l32)
    # eval path too
    ev = task16.eval_step(s16b, (x, y))
    assert np.isfinite(float(ev["valid_loss"]))
