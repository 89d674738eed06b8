"""HDemucs torch-numerics parity + converter round-trip.

The oracle (tests/_torch_hdemucs.py) is a pure-torch HDemucs written
from the published Demucs v3 / torchaudio architecture spec with
torchaudio-style state-dict names. These tests pin, against real torch
semantics on CPU:

  * convert_demucs maps every state-dict entry correctly;
  * the flax forward (models/demucs.py) reproduces the torch forward;
  * export_demucs is the exact inverse of convert_demucs.

Config under test (nfft=64, depth=3, norm_starts=1, dconv_lstm=2,
dconv_attn=1) exercises every structural feature: freq layers, the
last-freq collapse + time-branch inject, the time-only bottleneck
layer, GroupNorms, DConv with BLSTM (incl. >max_steps framing) and
LocalState attention, the empty time decoder, and the frequency
embedding.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from remfx_tpu.compat.torch_import import convert_demucs, export_demucs
from remfx_tpu.models.demucs import HDemucs

from tests._torch_hdemucs import HDemucs as TorchHDemucs

CFG = dict(
    sources=("mixture",),
    audio_channels=1,
    channels=8,
    nfft=64,
    depth=3,
    norm_starts=1,
    dconv_lstm=2,
    dconv_attn=1,
)


def _pair(seed=0):
    torch.manual_seed(seed)
    tm = TorchHDemucs(**CFG)
    tm.eval()
    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}
    variables = convert_demucs(sd)
    jm = HDemucs(**CFG)
    return tm, sd, variables, jm


def test_converted_tree_matches_init_structure():
    tm, sd, variables, jm = _pair()
    x = jnp.zeros((1, 1, 800), jnp.float32)
    ref = jm.init(jax.random.PRNGKey(0), x)

    def paths(tree):
        return {
            "/".join(str(k.key) for k in path): leaf.shape
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    got, want = paths(variables), paths(ref)
    assert set(got) == set(want), (
        sorted(set(want) - set(got))[:5], sorted(set(got) - set(want))[:5]
    )
    for k in want:
        assert got[k] == want[k], (k, got[k], want[k])


@pytest.mark.parametrize(
    "T", [800, pytest.param(4800, marks=pytest.mark.slow)]
)
def test_forward_parity_vs_torch(T):
    """4800 samples -> 300 STFT frames: exercises the BLSTM >200-step
    framing path at the bottleneck; 800 keeps a single frame window."""
    tm, sd, variables, jm = _pair()
    rng = np.random.default_rng(1)
    x = (0.1 * rng.standard_normal((2, 1, T))).astype(np.float32)
    with torch.no_grad():
        # torch returns (B, S, C, T); the reference wrapper squeezes S=1
        # (remfx/models.py DemucsModel), as does the flax output layout
        y_t = tm(torch.from_numpy(x)).squeeze(1).numpy()
    y_j = np.asarray(jm.apply(variables, jnp.asarray(x)))
    assert y_j.shape == y_t.shape
    scale = np.abs(y_t).max() + 1e-9
    err = np.abs(y_j - y_t).max() / scale
    assert err < 5e-4, f"max rel err {err:.2e} (scale {scale:.3e})"


def test_export_roundtrip_bit_exact():
    tm, sd, variables, jm = _pair()
    out = export_demucs(variables, style="torchaudio")
    assert set(out) == set(sd), (
        sorted(set(sd) - set(out))[:5], sorted(set(out) - set(sd))[:5]
    )
    for k in sd:
        np.testing.assert_array_equal(out[k], sd[k], err_msg=k)


def test_demucs_v3_name_style_accepted():
    """convert_demucs also accepts upstream demucs v3 ModuleList names
    (encoder/decoder/tencoder/tdecoder)."""
    tm, sd, variables, jm = _pair()
    renames = {"freq_encoder": "encoder", "freq_decoder": "decoder",
               "time_encoder": "tencoder", "time_decoder": "tdecoder"}
    sd_v3 = {}
    for k, v in sd.items():
        head = k.split(".", 1)[0]
        sd_v3[k.replace(head, renames.get(head, head), 1)] = v
    variables2 = convert_demucs(sd_v3)
    a = jax.tree_util.tree_leaves(variables)
    b = jax.tree_util.tree_leaves(variables2)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
