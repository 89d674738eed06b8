"""build_chain must accept vendored in-repo checkpoint dirs
(ckpts/<name>/hparams.json + variables/) wherever the reference configs
take a .ckpt path (reference cfg/exp/remfx_detect.yaml ckpt map /
classifier_ckpt) — one chain config can mix Zenodo torch files and
in-repo trained runs."""

import json
from pathlib import Path

import jax.numpy as jnp
import pytest

REPO = Path(__file__).resolve().parents[1]
TCN_AUG = REPO / "ckpts" / "tcn_distortion_aug"

pytestmark = pytest.mark.skipif(not TCN_AUG.is_dir(),
                                reason="no vendored ckpt")


def _min_cfg():
    from remfx_tpu.config.core import parse_cli

    cfg = parse_cli(["+exp=remfx_detect"])
    # keep only the distortion stage: the other four backbones are big
    # random inits this test doesn't exercise
    cfg["ckpts"] = {
        "RandomPedalboardDistortion": {
            "model": "tcn", "ckpt_path": str(TCN_AUG),
        },
    }
    cfg["classifier"] = None
    return cfg


def test_build_chain_vendored_dir():
    from remfx_tpu.chain.build import build_chain

    cfg = _min_cfg()
    chain = build_chain(cfg, jnp.zeros((1, 1, 32768), jnp.float32))
    assert list(chain.models) == ["RandomPedalboardDistortion"]
    wrapper, variables = chain.models["RandomPedalboardDistortion"]
    # the vendored hparams (nblocks=10, width=64) supersede the spec's
    # model entry — the loaded tree must match the trained run, not the
    # default network config
    hp = json.loads((TCN_AUG / "hparams.json").read_text())
    assert hp["model"]["network"]["nblocks"] == 10
    y = wrapper.sample(variables, jnp.zeros((1, 1, 32768), jnp.float32))
    assert y.ndim == 3


def test_build_chain_vendored_wrong_effect():
    from remfx_tpu.chain.build import build_chain

    cfg = _min_cfg()
    # mapping the distortion ckpt to the Reverb slot must hard-error —
    # a results-producing eval must never silently run the wrong remover
    cfg["ckpts"] = {
        "RandomPedalboardReverb": {
            "model": "tcn", "ckpt_path": str(TCN_AUG),
        },
    }
    with pytest.raises(ValueError, match="removes 'distortion'"):
        build_chain(cfg, jnp.zeros((1, 1, 32768), jnp.float32))
