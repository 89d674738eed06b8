"""Model correctness: LSTM parity vs torch (weight-layout contract), TCN
receptive field + conv parity, UMX separator shapes + training, Cnn14
output contract."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from remfx_tpu.models import make_model, make_cnn14
from remfx_tpu.models.lstm import LSTM


def test_lstm_matches_torch(rng):
    T, B, F, H = 12, 3, 8, 6
    x = rng.standard_normal((T, B, F)).astype(np.float32)
    ref = torch.nn.LSTM(F, H, num_layers=2, bidirectional=True)
    with torch.no_grad():
        out_ref, _ = ref(torch.from_numpy(x))

    model = LSTM(hidden_size=H, num_layers=2, bidirectional=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # copy torch weights in (names match 1:1)
    params = {}
    for name, tensor in ref.named_parameters():
        params[name] = jnp.asarray(tensor.detach().numpy())
    out = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), atol=2e-5)


def test_tcn_receptive_field_and_shapes(rng):
    w = make_model("tcn", nblocks=4, channel_width=8, kernel_size=3,
                   dilation_growth=2)
    rf = w.module.compute_receptive_field()
    assert rf == 3 + 2 * 2 + 2 * 4 + 2 * 8  # 31
    x = jnp.asarray(rng.standard_normal((2, 1, 1000)).astype(np.float32))
    variables = w.init(jax.random.PRNGKey(0), x)
    y = w.sample(variables, x)
    assert y.shape == (2, 1, 1000 - rf + 1)
    assert bool(jnp.all(jnp.abs(y) <= 1.0))  # tanh output


def test_tcn_conv_matches_torch(rng):
    # weight-layout contract: torch Conv1d -> flax Conv via (2,1,0) transpose
    import flax

    w = make_model("tcn", nblocks=1, channel_width=4, kernel_size=3,
                   dilation_growth=1)
    x = rng.standard_normal((1, 1, 64)).astype(np.float32)
    variables = w.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = flax.core.unfreeze(variables)["params"]

    tconv = torch.nn.Conv1d(1, 4, 3, dilation=1)
    tres = torch.nn.Conv1d(1, 4, 1, bias=False)
    tprelu = torch.nn.PReLU(4)
    tout = torch.nn.Conv1d(4, 1, 1)
    params["block0"]["conv1"]["kernel"] = jnp.asarray(
        tconv.weight.detach().numpy().transpose(2, 1, 0))
    params["block0"]["conv1"]["bias"] = jnp.asarray(tconv.bias.detach().numpy())
    params["block0"]["res"]["kernel"] = jnp.asarray(
        tres.weight.detach().numpy().transpose(2, 1, 0))
    params["block0"]["relu"]["weight"] = jnp.asarray(tprelu.weight.detach().numpy())
    params["output"]["kernel"] = jnp.asarray(
        tout.weight.detach().numpy().transpose(2, 1, 0))
    params["output"]["bias"] = jnp.asarray(tout.bias.detach().numpy())

    y = w.sample({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        xt = torch.from_numpy(x)
        h = tprelu(tconv(xt))
        res = tres(xt)
        # causal_crop drops the final sample: res[..., stop-L : stop]
        stop = res.shape[-1] - 1
        res = res[..., stop - h.shape[-1] : stop]
        ref = torch.tanh(tout(h + res))
    np.testing.assert_allclose(np.asarray(y), ref.numpy(), atol=1e-5)


def test_umx_separator_shapes_and_train(rng):
    w = make_model("umx", n_fft=512, hop_length=256)
    x = jnp.asarray(rng.standard_normal((2, 1, 8192)).astype(np.float32) * 0.1)
    variables = w.init(jax.random.PRNGKey(0), x)
    y = w.sample(variables, x)
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y)))
    # gradient flows + batch_stats update
    from remfx_tpu.train.tasks import RemovalTask

    task = RemovalTask(w, max_steps=10)
    state = task.init_state(jax.random.PRNGKey(1), x)
    assert state.batch_stats is not None
    state2, metrics = task.train_step(state, (x, x * 0.9), jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["train_loss"]))
    # running stats changed
    rm0 = state.batch_stats["model"]["bn1"]["running_mean"]
    # note: state donated; compare via metrics only
    assert state2.step == 1


def test_umx_identity_init_starts_near_input(rng):
    """identity_init=True must make the fresh model near-identity (the
    spectral mask starts ~1), so training begins AT the input SI-SDR
    baseline instead of 5-10 dB below it."""
    x = jnp.asarray(rng.standard_normal((1, 1, 8192)).astype(np.float32) * 0.1)

    def rel_err(identity_init):
        w = make_model("umx", n_fft=512, hop_length=256,
                       identity_init=identity_init)
        v = w.init(jax.random.PRNGKey(0), x)
        y = w.sample(v, x)
        return float(jnp.linalg.norm(y - x) / jnp.linalg.norm(x))

    assert rel_err(True) < 0.25 < rel_err(False)


def test_dcunet_identity_init_starts_near_input(rng):
    """identity_init=True adds a flag-gated mask bias so the fresh
    complex mask starts ~tanh(1.5)+0j and audio passes through; without
    it a random mask fully scrambles the input (rel err ~1)."""
    x = jnp.asarray(rng.standard_normal((1, 1, 8192)).astype(np.float32) * 0.1)

    def rel_err_and_params(identity_init):
        w = make_model("dcunet", architecture="Mini-DCUNet-6",
                       stft_kernel_size=64, identity_init=identity_init)
        v = w.init(jax.random.PRNGKey(0), x)
        y = w.sample(v, x)
        return (float(jnp.linalg.norm(y - x) / jnp.linalg.norm(x)),
                v["params"])

    err_id, params_id = rel_err_and_params(True)
    err_rand, params_rand = rel_err_and_params(False)
    assert err_id < 0.3 < err_rand
    # the extra param exists ONLY under the flag (torch ckpt import uses
    # identity_init=False, so its param structure is unchanged)
    assert "mask_bias" in params_id and "mask_bias" not in params_rand


def test_make_model_warns_on_ignored_network_keys(caplog):
    """A swallowed model.network key once silently sized the wrong net;
    make_model must surface keys that fall into a factory's catch-all."""
    import logging

    with caplog.at_level(logging.WARNING, logger="remfx_tpu.models"):
        make_model("tcn", nblocks=2, channel_width=4, kernel_size=3,
                   dilation_growth=2, hidden_sizee=64)
    assert any("hidden_sizee" in r.message for r in caplog.records)


def test_umx_hidden_size_wired(rng):
    """model.network.hidden_size must actually size the net (it was
    silently swallowed by make_umx(**_ignored) once)."""
    x = jnp.asarray(rng.standard_normal((1, 1, 4096)).astype(np.float32))
    w = make_model("umx", n_fft=512, hop_length=256, hidden_size=64)
    v = w.init(jax.random.PRNGKey(0), x)
    assert v["params"]["model"]["fc1"]["weight"].shape[0] == 64


def test_cnn14_output_contract(rng):
    net = make_cnn14(num_classes=5, sample_rate=48000, model_sample_rate=48000,
                     n_fft=512, hop_length=256, n_mels=32)
    x = jnp.asarray(rng.standard_normal((2, 1, 8192)).astype(np.float32))
    variables = net.init({"params": jax.random.PRNGKey(0)}, x, False)
    probs = net.apply(variables, x)
    assert probs.shape == (2, 5)
    assert bool(jnp.all((probs >= 0) & (probs <= 1)))


def test_dcunet_shapes_and_train(rng):
    w = make_model("dcunet", architecture="Mini-DCUNet-6",
                   stft_kernel_size=256)
    x = jnp.asarray(rng.standard_normal((1, 1, 16384)).astype(np.float32) * 0.1)
    variables = w.init(jax.random.PRNGKey(0), x)
    y = w.sample(variables, x)
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y)))
    from remfx_tpu.train.tasks import RemovalTask

    task = RemovalTask(w, max_steps=10)
    state = task.init_state(jax.random.PRNGKey(1), x)
    state2, metrics = task.train_step(state, (x, x * 0.9), jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["train_loss"]))


def test_dptnet_shapes_and_train(rng):
    w = make_model("dptnet", chunk_size=20, n_repeats=1)
    x = jnp.asarray(rng.standard_normal((1, 1, 4096)).astype(np.float32) * 0.1)
    variables = w.init(jax.random.PRNGKey(0), x)
    y = w.sample(variables, x)
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y)))
    from remfx_tpu.train.tasks import RemovalTask

    task = RemovalTask(w, max_steps=10)
    state = task.init_state(jax.random.PRNGKey(1), x)
    state2, metrics = task.train_step(state, (x, x * 0.9), jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["train_loss"]))


def test_demucs_shapes_and_train(rng):
    # nfft 1024 -> 4 freq layers + 1 time-only layer at depth 5 (same
    # structural shape as the published nfft-4096/depth-6 config)
    w = make_model("demucs", nfft=1024, channels=4, depth=5)
    x = jnp.asarray(rng.standard_normal((1, 1, 16384)).astype(np.float32) * 0.1)
    variables = w.init(jax.random.PRNGKey(0), x)
    y = w.sample(variables, x)
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y)))
    from remfx_tpu.train.tasks import RemovalTask

    task = RemovalTask(w, max_steps=10)
    state = task.init_state(jax.random.PRNGKey(1), x)
    state2, metrics = task.train_step(state, (x, x * 0.9), jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["train_loss"]))


def test_cnn14_short_clip_finite():
    """Short clips must not pool the time axis to zero size (empty-axis
    mean -> NaN probs, which silently corrupted accuracy metrics)."""
    import jax
    import jax.numpy as jnp

    from remfx_tpu.models import make_cnn14

    net = make_cnn14(num_classes=5, sample_rate=48000)
    x = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (2, 1, 8192),
                                jnp.float32)
    v = net.init({"params": jax.random.PRNGKey(1)}, x, False)
    probs = net.apply(v, x, False)
    assert bool(jnp.all(jnp.isfinite(probs))), np.asarray(probs)


def test_lstm_init_matches_torch_reset_parameters():
    """torch nn.LSTM inits every weight AND bias to U(-k, k) with
    k = 1/sqrt(hidden); one-sided or zero inits start all gates
    saturated and degrade from-scratch training."""
    m = LSTM(hidden_size=16, num_layers=1)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((4, 2, 8)))
    k = 1.0 / np.sqrt(16)
    for name, p in v["params"].items():
        p = np.asarray(p)
        assert p.min() < 0 < p.max(), name
        assert abs(p).max() <= k + 1e-6, name
        assert abs(p.mean()) < 0.3 * k, name


def test_embedding_classifier_mono_sums_stereo():
    """(B, C, T) input must mono-sum, not concatenate channels in time."""
    from remfx_tpu.models.embedding_classifiers import EmbeddingClassifier

    net = EmbeddingClassifier(
        num_classes=5, sample_rate=16000,
        embed_fn=lambda x: x[:, :8], embed_rate=16000,
    )
    stereo = jnp.stack([jnp.ones((2, 64)), -0.5 * jnp.ones((2, 64))], axis=1)
    v = net.init(jax.random.PRNGKey(0), stereo)
    out3 = net.apply(v, stereo)
    out2 = net.apply(v, stereo.sum(axis=1))
    np.testing.assert_allclose(np.asarray(out3), np.asarray(out2), atol=1e-6)


def test_demucs_identity_init_starts_near_input(rng):
    """identity_init=True zero-inits the two final decoder convs and
    adds a residual skip in the wrapper, so a fresh HDemucs is a
    passthrough up to the denorm means (~-50 dB rel err); without it the
    random decoder fully scrambles the input. Param structure is
    IDENTICAL either way (torch weight-compat imports keep False)."""
    x = jnp.asarray(rng.standard_normal((1, 1, 4096)).astype(np.float32) * 0.1)

    def rel_err_and_params(identity_init):
        w = make_model("demucs", sources=["mixture"], audio_channels=1,
                       nfft=256, channels=4, depth=3,
                       identity_init=identity_init)
        v = w.init(jax.random.PRNGKey(0), x)
        y = w.sample(v, x)
        return (float(jnp.linalg.norm(y - x) / jnp.linalg.norm(x)), v)

    err_id, v_id = rel_err_and_params(True)
    err_rand, v_rand = rel_err_and_params(False)
    assert err_id < 1e-2 < err_rand
    assert jax.tree_util.tree_structure(v_id) == \
        jax.tree_util.tree_structure(v_rand)
