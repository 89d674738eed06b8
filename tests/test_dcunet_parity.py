"""DCUNet torch-numerics parity + converter round-trip.

Oracle: tests/_torch_dcunet.py (asteroid-structure masker over torch
complex ops + the shared tight-frame STFT filterbank). Pins, against
real torch conv/convtranspose/BatchNorm semantics:

  * convert_dcunet maps masker state dicts for BOTH norm flavors;
  * the flax forward (models/dcunet.py) reproduces the torch forward,
    including the skip-concat-after-decode graph, odd-frame time
    padding, and the bounded tanh mask;
  * export_dcunet is the exact inverse of convert_dcunet.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from remfx_tpu.compat.torch_import import (
    convert_dcunet,
    detect_dcunet_norm_type,
    export_dcunet,
)
from remfx_tpu.models.dcunet import (
    MINI_DCUNET_6,
    DCUNet,
    _stft_filters,
)

from tests._torch_dcunet import TorchDCUNet

K = 64  # stft kernel -> F = 33; MINI freq stride product 4: (33-1)%4==0


def _pair(norm_type, seed=0, train_steps=1):
    torch.manual_seed(seed)
    tm = TorchDCUNet(MINI_DCUNET_6, K, norm_type=norm_type,
                     filters=_stft_filters(K))
    # randomize BN running stats with a train-mode pass
    tm.train()
    with torch.no_grad():
        for i in range(train_steps):
            w = 0.3 * torch.randn(2, 700 + 64 * i)
            tm(w)
    tm.eval()
    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()
          if k != "filters"}
    assert detect_dcunet_norm_type(sd) == norm_type
    variables = convert_dcunet(sd)
    jm = DCUNet(architecture="Mini-DCUNet-6", stft_kernel_size=K,
                norm_type=norm_type)
    return tm, sd, variables, jm


@pytest.mark.parametrize("norm_type", ["bN", "CbN"])
def test_converted_tree_matches_init_structure(norm_type):
    tm, sd, variables, jm = _pair(norm_type)
    ref = jm.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 700)))

    def paths(tree):
        return {
            "/".join(str(k.key) for k in path): tuple(leaf.shape)
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    got, want = paths(variables), paths(ref)
    assert set(got) == set(want), (
        sorted(set(want) - set(got))[:6], sorted(set(got) - set(want))[:6]
    )
    for k in want:
        assert got[k] == want[k], (k, got[k], want[k])


@pytest.mark.parametrize("norm_type", ["bN", "CbN"])
@pytest.mark.parametrize("T", [700, 2048])
def test_forward_parity_vs_torch(norm_type, T):
    """700 samples -> 20 frames (odd, exercises the (N-1)%time_prod
    zero-pad); 2048 -> 63 frames."""
    tm, sd, variables, jm = _pair(norm_type)
    rng = np.random.default_rng(1)
    x = (0.2 * rng.standard_normal((2, T))).astype(np.float32)
    with torch.no_grad():
        y_t = tm(torch.from_numpy(x)).numpy()
    y_j = np.asarray(jm.apply(variables, jnp.asarray(x)))
    assert y_j.shape == y_t.shape
    scale = np.abs(y_t).max() + 1e-9
    err = np.abs(y_j - y_t).max() / scale
    assert err < 5e-4, f"{norm_type}: max rel err {err:.2e}"


@pytest.mark.parametrize("norm_type", ["bN", "CbN"])
def test_export_roundtrip_bit_exact(norm_type):
    tm, sd, variables, jm = _pair(norm_type)
    out = export_dcunet(variables)
    missing = {k for k in sd if not k.endswith("num_batches_tracked")} - set(out)
    extra = set(out) - set(sd)
    assert not missing and not extra, (sorted(missing)[:5], sorted(extra)[:5])
    for k in out:
        np.testing.assert_array_equal(out[k], sd[k], err_msg=k)


def test_gauss_lowering_same_math():
    """gauss_conv=True is a pure lowering change: identical outputs."""
    _, _, variables, jm = _pair("bN")
    x = jnp.asarray(
        0.2 * np.random.default_rng(2).standard_normal((1, 700)),
        jnp.float32,
    )
    y0 = jm.apply(variables, x)
    jm2 = DCUNet(architecture="Mini-DCUNet-6", stft_kernel_size=K,
                 norm_type="bN", gauss_conv=True)
    y1 = jm2.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=2e-5, rtol=1e-4)
