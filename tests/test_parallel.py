"""Multi-device coverage on the 8-device virtual CPU mesh: dp training
step, dp x tp sharded step, and the graft dryrun entry."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from remfx_tpu.models import make_model
from remfx_tpu.parallel import make_mesh, replicate, shard_batch, shard_tcn_params
from remfx_tpu.train.tasks import RemovalTask


def _task():
    w = make_model("tcn", nblocks=3, channel_width=16, kernel_size=3,
                   dilation_growth=2)
    return RemovalTask(w, max_steps=100)


def test_dp_training_step_8dev(rng):
    assert jax.device_count() >= 8
    mesh = make_mesh(dp=8, tp=1)
    task = _task()
    x = jnp.asarray(rng.standard_normal((16, 1, 4096)).astype(np.float32) * 0.1)
    state = task.init_state(jax.random.PRNGKey(0), x)
    state = replicate(state, mesh)
    batch = shard_batch((x, x * 0.5), mesh)
    state2, metrics = task.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["train_loss"]))
    # result equals single-device execution (same math, just sharded)
    task_s = _task()
    state_s = task_s.init_state(jax.random.PRNGKey(0), x)
    _, metrics_s = task_s.train_step(state_s, (x, x * 0.5), jax.random.PRNGKey(1))
    assert abs(float(metrics["train_loss"]) - float(metrics_s["train_loss"])) < 1e-3


def test_dp_tp_sharded_step(rng):
    mesh = make_mesh(dp=4, tp=2)
    task = _task()
    x = jnp.asarray(rng.standard_normal((8, 1, 4096)).astype(np.float32) * 0.1)
    state = task.init_state(jax.random.PRNGKey(0), x)
    state = replicate(state, mesh)
    state = state.replace(params=shard_tcn_params(state.params, mesh))
    batch = shard_batch((x, x * 0.5), mesh)
    state2, metrics = task.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["train_loss"]))


@pytest.mark.slow  # the round driver also runs this exact check out-of-band
def test_graft_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_fit_multidevice_matches_single(tmp_path):
    """trainer.devices wired into fit() (VERDICT r1 #4): an 8-device dp
    mesh must produce the same training trajectory as single-device
    (same data order, same keys; GSPMD summing shard gradients equals
    the global batch gradient)."""
    from remfx_tpu.config.core import parse_cli
    from remfx_tpu.train.loop import fit

    def run(devices, tag):
        cfg = parse_cli([
            "+exp=distortion", "model.name=tcn",
            "model.network.nblocks=3", "model.network.channel_width=8",
            "model.network.kernel_size=3", "model.network.dilation_growth=2",
            "datamodule.synthetic=true", "datamodule.dataset_type=dynamic",
            "datamodule.train_chunks=8", "datamodule.val_chunks=2",
            "datamodule.test_chunks=2", "datamodule.train_batch_size=8",
            "datamodule.test_batch_size=2", "trainer.max_steps=2",
            "trainer.max_epochs=1", "chunk_size=4096",
            f"trainer.devices={devices}",
            f"logs_dir={tmp_path / tag}",
        ])
        cfg["render_root"] = str(tmp_path / f"data_{tag}")
        state, metrics = fit(cfg)
        return metrics

    m1 = run(1, "single")
    m8 = run(8, "mesh8")
    assert np.isfinite(m8["test_loss"])
    np.testing.assert_allclose(m8["test_loss"], m1["test_loss"],
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(m8["test_SISDR"], m1["test_SISDR"],
                               rtol=2e-3, atol=2e-3)


def test_build_mesh_uses_device_subset():
    """trainer.devices < device_count is a legitimate 'use N of M'
    request: build_mesh must mesh over exactly N devices instead of
    crashing on the dp*tp != M check."""
    from remfx_tpu.train.loop import build_mesh

    assert jax.device_count() >= 8
    mesh = build_mesh({"trainer": {"devices": 4, "tensor_parallel": 2}})
    assert dict(mesh.shape) == {"dp": 2, "tp": 2}
    assert mesh.devices.size == 4

    with pytest.raises(ValueError, match="devices"):
        build_mesh({"trainer": {"devices": 1024}})

    assert build_mesh({"trainer": {"devices": 1}}) is None


def test_sequence_parallel_inference_exact():
    """Long-file sequence parallelism (SURVEY §5.7): a jitted model on a
    time-sharded batch-1 input matches unsharded to float rounding —
    GSPMD inserts the conv/STFT halo exchanges. Covers a waveform (TCN)
    and an STFT-domain (DCUNet) backbone."""
    import jax.numpy as jnp

    from remfx_tpu.parallel import make_mesh, replicate, shard_time

    mesh = make_mesh(dp=8, tp=1)
    x = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (1, 1, 32768),
                                jnp.float32)
    xs = shard_time(x, mesh)
    for name, cfg in [
        ("tcn", dict(nblocks=4, channel_width=8, kernel_size=7,
                     dilation_growth=2)),
        ("dcunet", dict(architecture="Mini-DCUNet-6", stft_kernel_size=64)),
    ]:
        w = make_model(name, **cfg)
        v = w.init(jax.random.PRNGKey(1), x)
        f = jax.jit(lambda v, x, w=w: w.sample(v, x))
        y_ref = f(v, x)
        y_sp = f(replicate(v, mesh), xs)
        # same math; halo-exchange partials reassociate float rounding
        np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_sp),
                                   atol=1e-6, err_msg=name)


def test_shard_ragged_tail_batch_trims():
    """A ragged end-of-epoch batch must not crash multi-device training:
    strict sharding trims to the largest dp multiple (drop-last), and
    batches smaller than dp replicate (review r2 finding)."""
    from remfx_tpu.train.loop import _shard

    mesh = make_mesh(dp=8, tp=1)
    x = jnp.ones((11, 1, 64))
    y = jnp.zeros((11, 1, 64))
    bx, by = _shard((x, y), mesh, strict=True)
    assert bx.shape[0] == 8 and by.shape[0] == 8

    tiny = _shard((jnp.ones((3, 1, 64)),), mesh, strict=True)[0]
    assert tiny.shape[0] == 3  # replicated, not trimmed to zero


def test_shard_time_accepts_non_arrays():
    from remfx_tpu.parallel import make_mesh, shard_time

    mesh = make_mesh(dp=8, tp=1)
    out = shard_time([[list(range(16))]], mesh)
    assert out.shape == (1, 1, 16)
