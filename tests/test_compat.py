"""Weight-converter tests: build torch-layout state dicts, convert, and
check numerics (Cnn14 conv-block vs torch) and structural completeness
(TCN/Cnn14 full forward with converted trees)."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from remfx_tpu.compat.torch_import import (
    convert_cnn14,
    convert_tcn,
    convert_umx,
    strip_prefix,
)
from remfx_tpu.models import make_cnn14, make_model


def test_strip_prefix():
    sd = {"model.model.process_blocks.0.conv1.weight": 1,
          "network.fc1.weight": 2, "plain": 3}
    out = strip_prefix(sd)
    assert set(out) == {"process_blocks.0.conv1.weight", "fc1.weight", "plain"}


def _torch_tcn_state(nblocks=2, width=4, k=3):
    sd = {}
    g = torch.Generator().manual_seed(0)
    in_ch = 1
    for n in range(nblocks):
        sd[f"process_blocks.{n}.conv1.weight"] = torch.randn(width, in_ch, k, generator=g)
        sd[f"process_blocks.{n}.conv1.bias"] = torch.randn(width, generator=g)
        sd[f"process_blocks.{n}.res.weight"] = torch.randn(width, in_ch, 1, generator=g)
        sd[f"process_blocks.{n}.relu.weight"] = torch.rand(width, generator=g)
        in_ch = width
    sd["output.weight"] = torch.randn(1, width, 1, generator=g)
    sd["output.bias"] = torch.randn(1, generator=g)
    return {k_: v.numpy() for k_, v in sd.items()}


def test_tcn_converter_structural(rng):
    sd = _torch_tcn_state()
    variables = convert_tcn(sd)
    w = make_model("tcn", nblocks=2, channel_width=4, kernel_size=3,
                   dilation_growth=2)
    x = jnp.asarray(rng.standard_normal((1, 1, 256)).astype(np.float32))
    # converted tree must be accepted verbatim by the module
    y = w.sample(jax.device_put(variables), x)
    assert np.isfinite(np.asarray(y)).all()
    # structural match against a fresh init
    ref = w.init(jax.random.PRNGKey(0), x)
    conv_paths = jax.tree_util.tree_structure(variables["params"])
    ref_paths = jax.tree_util.tree_structure(
        jax.tree.map(lambda v: 0, dict(ref["params"]))
    )
    assert str(conv_paths) == str(ref_paths)


def test_cnn14_convblock_numerics(rng):
    # one conv block through torch vs converted flax params
    tconv1 = torch.nn.Conv2d(1, 8, 3, padding=1, bias=False)
    tbn1 = torch.nn.BatchNorm2d(8).eval()
    tconv2 = torch.nn.Conv2d(8, 8, 3, padding=1, bias=False)
    tbn2 = torch.nn.BatchNorm2d(8).eval()
    with torch.no_grad():
        tbn1.running_mean.normal_(); tbn1.running_var.uniform_(0.5, 2.0)
        tbn2.running_mean.normal_(); tbn2.running_var.uniform_(0.5, 2.0)
        tbn1.weight.normal_(); tbn1.bias.normal_()
        tbn2.weight.normal_(); tbn2.bias.normal_()

    x = rng.standard_normal((2, 1, 16, 20)).astype(np.float32)
    with torch.no_grad():
        ref = torch.relu(tbn1(tconv1(torch.from_numpy(x))))
        ref = torch.relu(tbn2(tconv2(ref)))
        ref = torch.nn.functional.avg_pool2d(ref, 2).numpy()

    from remfx_tpu.models.cnn14 import ConvBlock

    blk = ConvBlock(8)
    params = {
        "conv1": {"kernel": jnp.asarray(tconv1.weight.detach().numpy().transpose(2, 3, 1, 0))},
        "conv2": {"kernel": jnp.asarray(tconv2.weight.detach().numpy().transpose(2, 3, 1, 0))},
        "bn1": {"scale": jnp.asarray(tbn1.weight.detach().numpy()),
                 "bias": jnp.asarray(tbn1.bias.detach().numpy())},
        "bn2": {"scale": jnp.asarray(tbn2.weight.detach().numpy()),
                 "bias": jnp.asarray(tbn2.bias.detach().numpy())},
    }
    stats = {
        "bn1": {"mean": jnp.asarray(tbn1.running_mean.numpy()),
                 "var": jnp.asarray(tbn1.running_var.numpy())},
        "bn2": {"mean": jnp.asarray(tbn2.running_mean.numpy()),
                 "var": jnp.asarray(tbn2.running_var.numpy())},
    }
    xin = jnp.asarray(x.transpose(0, 2, 3, 1))  # NHWC
    y = blk.apply({"params": params, "batch_stats": stats}, xin, False)
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 3, 1, 2), ref, atol=1e-4
    )


def test_umx_converter_roundtrip(rng):
    w = make_model("umx", n_fft=512, hop_length=256)
    x = jnp.asarray(rng.standard_normal((1, 1, 4096)).astype(np.float32))
    variables = w.init(jax.random.PRNGKey(0), x)
    # build a torch-style flat state dict from the flax tree, convert back,
    # and require identical structure + values (verbatim-name contract)
    flat = {}

    def flatten(prefix, node, stats=False):
        for k, v in node.items():
            name = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                flatten(name, v, stats)
            else:
                flat[name] = np.asarray(v)

    flatten("", variables["params"]["model"])
    flatten("", variables["batch_stats"]["model"])
    out = convert_umx(flat)
    from remfx_tpu.models.umx import OpenUnmix

    net = OpenUnmix(nb_bins=257)
    mag = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (1, 1, 257, 9)))
    y0 = net.apply(
        {"params": variables["params"]["model"],
         "batch_stats": variables["batch_stats"]["model"]},
        mag,
    )
    y1 = net.apply(jax.device_put(out), mag)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)


def test_detect_kind_fingerprints():
    """detect_kind recognizes every checkpoint family from state-dict
    keys alone (filename-independent torch import)."""
    from remfx_tpu.compat.torch_import import detect_kind

    assert detect_kind({"masker.encoders.0.conv.re_module.weight": 0}) == "dcunet"
    assert detect_kind({"encoder.0.conv.weight": 0}) == "demucs"
    assert detect_kind({"tencoder.0.conv.weight": 0}) == "demucs"
    assert detect_kind({"freq_emb.embedding.weight": 0}) == "demucs"
    assert detect_kind({"conv_block1.conv1.weight": 0}) == "cnn14"
    assert detect_kind({"process_blocks.0.conv1.weight": 0}) == "tcn"
    assert detect_kind({"masker.layers.0.0.mha.in_proj_weight": 0}) == "dptnet"
    assert detect_kind({"lstm.weight_ih_l0": 0}) == "umx"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        detect_kind({"mystery.weight": 0})


def test_import_torch_checkpoint_file(tmp_path):
    """End-to-end torch .ckpt file -> flax variables: Lightning-style
    pickle with wrapper prefixes, auto kind detection, structure check
    against module init."""
    import jax

    from remfx_tpu.compat.torch_import import (
        check_structure,
        import_torch_checkpoint,
    )
    from remfx_tpu.models import make_model

    sd = _torch_tcn_state(nblocks=2, width=4, k=3)
    lightning = {"state_dict": {f"model.model.{k}": v for k, v in sd.items()},
                 "epoch": 3}
    p = tmp_path / "tcn_test.ckpt"
    torch.save(lightning, p)

    kind, variables = import_torch_checkpoint(str(p))
    assert kind == "tcn"
    w = make_model("tcn", nblocks=2, channel_width=4, kernel_size=3,
                   dilation_growth=2)
    template = w.init(jax.random.PRNGKey(0), jax.numpy.ones((1, 1, 256)))
    check_structure(variables, jax.device_get(template))
    # and the structure check really fails on a broken tree
    broken = {"params": dict(variables["params"])}
    broken["params"].pop("output")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="structure mismatch"):
        check_structure(broken, jax.device_get(template))
