"""DPTNet converter round-trip + torch-layout MHA numerics.

No published RemFX checkpoint uses DPTNet, so (unlike demucs/dcunet)
there is no full-forward torch oracle; instead we pin the risky parts:
the torch-parameter-layout MultiheadAttention against
torch.nn.MultiheadAttention, and the converter/export round-trip on a
real flax init tree.
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from remfx_tpu.compat.torch_import import convert_dptnet, export_dptnet
from remfx_tpu.models import make_model
from remfx_tpu.models.dptnet import TorchMHA


def test_torch_mha_layout_numerics():
    C, h, S, B = 16, 4, 9, 3
    torch.manual_seed(0)
    tm = torch.nn.MultiheadAttention(C, h)  # seq-first
    tm.eval()
    x = 0.3 * np.random.default_rng(0).standard_normal((S, B, C)).astype(
        np.float32)
    with torch.no_grad():
        y_t = tm(torch.from_numpy(x), torch.from_numpy(x),
                 torch.from_numpy(x))[0].numpy()
    variables = {"params": {
        "in_proj_weight": tm.in_proj_weight.detach().numpy(),
        "in_proj_bias": tm.in_proj_bias.detach().numpy(),
        "out_proj_weight": tm.out_proj.weight.detach().numpy(),
        "out_proj_bias": tm.out_proj.bias.detach().numpy(),
    }}
    y_j = np.asarray(TorchMHA(C, h).apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(y_j, y_t, atol=2e-5, rtol=1e-4)


def test_dptnet_converter_roundtrip():
    w = make_model("dptnet", chunk_size=20, n_repeats=2)
    x = jnp.zeros((1, 1, 4096), jnp.float32)
    variables = w.init(jax.random.PRNGKey(0), x)
    sd = export_dptnet(variables)
    # keys look like asteroid's
    assert "encoder.filterbank._filters" in sd
    assert "masker.layers.0.0.mha.in_proj_weight" in sd
    assert "masker.layers.1.1.recurrent.weight_ih_l0_reverse" in sd
    assert "masker.first_out.1.weight" in sd
    back = convert_dptnet(sd)

    flat_a = jax.tree_util.tree_flatten_with_path(variables)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    pa = {tuple(str(k.key) for k in p): v for p, v in flat_a}
    pb = {tuple(str(k.key) for k in p): v for p, v in flat_b}
    assert set(pa) == set(pb), (
        sorted(set(pa) - set(pb))[:5], sorted(set(pb) - set(pa))[:5])
    for k in pa:
        np.testing.assert_array_equal(np.asarray(pa[k]), np.asarray(pb[k]),
                                      err_msg=str(k))


def test_dptnet_forward_mask_bounded():
    w = make_model("dptnet", chunk_size=20, n_repeats=1)
    x = jnp.asarray(
        0.1 * np.random.default_rng(1).standard_normal((2, 1, 4096)),
        jnp.float32)
    variables = w.init(jax.random.PRNGKey(0), x)
    y = w.sample(variables, x)
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y)))
