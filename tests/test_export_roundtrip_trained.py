"""Round-trip REAL trained weights through the torch .ckpt container
(VERDICT r4 #6): export a vendored trained flax checkpoint with the
compat exporters, save it in the Lightning container format the Zenodo
artifacts use (reference scripts/download_ckpts.sh:7-11 produce
``{"state_dict": {"model.model.<key>": tensor}}`` files, loaded at
reference scripts/test.py:20-23), then re-import through
``import_torch_checkpoint`` — the exact pipeline the first networked
Zenodo minute will use — and require bit-exact recovery.

Random-init round trips are covered per-architecture in
test_{demucs,dcunet,dptnet}_parity.py; this test upgrades that evidence
to trained parameter values (non-symmetric, bf16-upcast) and to the
file-container layer (torch.save/load + prefix stripping + family
fingerprinting), which the per-architecture tests bypass.
"""

from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]

# vendored trained checkpoint dirs -> (exporter name, expected family)
_EXPORTABLE = {
    "dcunet": "dcunet",
    "demucs": "demucs",
    "dptnet": "dptnet",
}


def _trained_ckpt_dirs():
    """Every vendored ckpt dir whose backbone has a torch exporter."""
    import json

    out = []
    for d in sorted((REPO / "ckpts").iterdir()):
        hp = d / "hparams.json"
        if not hp.is_file():
            continue
        name = json.loads(hp.read_text()).get("model", {}).get("name")
        if name in _EXPORTABLE:
            out.append(pytest.param(d, name, id=d.name))
    return out


@pytest.mark.slow
@pytest.mark.parametrize("ckpt_dir,family", _trained_ckpt_dirs())
def test_trained_ckpt_torch_container_roundtrip(tmp_path, ckpt_dir, family):
    import torch

    from remfx_tpu.compat import torch_import as ti
    from remfx_tpu.train.checkpoint import load_trained_wrapper

    _, _, variables = load_trained_wrapper(str(ckpt_dir))

    exporter = getattr(ti, f"export_{family}")
    sd = exporter(variables)
    assert sd, "exporter produced an empty state dict"

    # Lightning container layout: RemFX task module holds the wrapper at
    # .model which holds the backbone at .model (reference
    # remfx/models.py:152 + 259-390)
    container = {
        "state_dict": {
            f"model.model.{k}": torch.from_numpy(np.ascontiguousarray(v))
            for k, v in sd.items()
        }
    }
    path = tmp_path / f"{ckpt_dir.name}.ckpt"
    torch.save(container, path)

    kind, converted = ti.import_torch_checkpoint(str(path))
    assert kind == family

    import jax

    ti.check_structure(converted, jax.device_get(variables))

    def leaves(tree):
        return {
            "/".join(str(getattr(k, "key", k)) for k in p): leaf
            for p, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    orig, back = leaves(jax.device_get(variables)), leaves(converted)
    assert set(orig) == set(back)
    for key in orig:
        np.testing.assert_array_equal(
            np.asarray(back[key]), np.asarray(orig[key]), err_msg=key
        )
