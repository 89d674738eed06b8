"""Torch-checkpoint -> flax-pytree weight converters.

Targets the published Zenodo checkpoints (reference
scripts/download_ckpts.sh: classifier.ckpt = Cnn14 inside FXClassifier;
dcunet_*/demucs_* inside RemFX wrappers). Lightning state dicts carry
prefixes like ``model.model.`` / ``network.`` which we strip.

Layout rules (validated numerically in tests/test_models.py and
tests/test_compat.py against torch primitives):
  * Conv1d  weight (out, in, k)      -> kernel (k, in, out)
  * Conv2d  weight (out, in, kh, kw) -> kernel (kh, kw, in, out)
  * Linear  weight (out, in)         -> Dense kernel (in, out)
    (UMX `_Linear` keeps torch (out, in) layout verbatim)
  * BatchNorm weight/bias/running_mean/running_var ->
    params {scale, bias} + batch_stats {mean, var} (flax.linen.BatchNorm)
    or verbatim names for the torch-layout `_BatchNorm1d`
  * LSTM weight_ih_l{n}[_reverse] etc. -> identical names (models/lstm.py)

Loading the .ckpt files requires torch (CPU) for unpickling; this module
only needs the resulting numpy state dict.
"""

from __future__ import annotations

import re

import numpy as np


def load_torch_state_dict(path: str) -> dict:
    """Unpickle a torch/Lightning checkpoint -> {name: np.ndarray}."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj)
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in sd.items()}


def strip_prefix(sd: dict, prefixes=("model.model.", "model.", "network.")) -> dict:
    """Remove the longest matching Lightning wrapper prefix per key."""
    out = {}
    for k, v in sd.items():
        for p in sorted(prefixes, key=len, reverse=True):
            if k.startswith(p):
                k = k[len(p):]
                break
        out[k] = v
    return out


def _set(tree: dict, path: list[str], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_tcn(sd: dict) -> dict:
    """Reference TCN state dict -> {'params': ...} (models/tcn.py)."""
    params: dict = {}
    for k, v in sd.items():
        m = re.match(r"process_blocks\.(\d+)\.(conv1|res)\.(weight|bias)", k)
        if m:
            n, layer, kind = m.groups()
            if kind == "weight":
                _set(params, [f"block{n}", layer, "kernel"], v.transpose(2, 1, 0))
            else:
                _set(params, [f"block{n}", layer, "bias"], v)
            continue
        m = re.match(r"process_blocks\.(\d+)\.relu\.weight", k)
        if m:
            _set(params, [f"block{m.group(1)}", "relu", "weight"], v)
            continue
        if k == "output.weight":
            _set(params, ["output", "kernel"], v.transpose(2, 1, 0))
        elif k == "output.bias":
            _set(params, ["output", "bias"], v)
    return {"params": params}


def convert_cnn14(sd: dict) -> dict:
    """Reference Cnn14 state dict -> {'params', 'batch_stats'}."""
    params: dict = {}
    stats: dict = {}
    for k, v in sd.items():
        m = re.match(r"conv_block(\d)\.(conv\d)\.weight", k)
        if m:
            blk, conv = m.groups()
            _set(params, [f"conv_block{blk}", conv, "kernel"],
                 v.transpose(2, 3, 1, 0))
            continue
        m = re.match(r"conv_block(\d)\.(bn\d)\.(weight|bias|running_mean|running_var)", k)
        if m:
            blk, bn, kind = m.groups()
            dest = {
                "weight": (params, "scale"),
                "bias": (params, "bias"),
                "running_mean": (stats, "mean"),
                "running_var": (stats, "var"),
            }[kind]
            _set(dest[0], [f"conv_block{blk}", bn, dest[1]], v)
            continue
        m = re.match(r"bn0\.(weight|bias|running_mean|running_var)", k)
        if m:
            kind = m.group(1)
            dest = {
                "weight": (params, "scale"),
                "bias": (params, "bias"),
                "running_mean": (stats, "mean"),
                "running_var": (stats, "var"),
            }[kind]
            _set(dest[0], ["bn0_unused", dest[1]], v)
            continue
        if k == "fc1.weight":
            _set(params, ["fc1", "kernel"], v.T)
        elif k == "fc1.bias":
            _set(params, ["fc1", "bias"], v)
        else:
            m = re.match(r"heads\.(\d+)\.(weight|bias)", k)
            if m:
                i, kind = m.groups()
                if kind == "weight":
                    _set(params, [f"head{i}", "kernel"], v.T)
                else:
                    _set(params, [f"head{i}", "bias"], v)
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def convert_umx(sd: dict) -> dict:
    """OpenUnmix state dict -> {'params', 'batch_stats'} (models/umx.py).

    UMX modules use torch-verbatim names, so this is mostly a re-rooting
    of running stats into batch_stats.
    """
    params: dict = {}
    stats: dict = {}
    for k, v in sd.items():
        parts = k.split(".")
        if parts[-1] in ("running_mean", "running_var"):
            _set(stats, parts, v)
        elif parts[-1] == "num_batches_tracked":
            continue
        elif len(parts) == 1:  # input_mean / input_scale / output_*
            _set(params, parts, v)
        elif parts[0] == "lstm":
            _set(params, ["lstm", parts[1]], v)
        else:
            _set(params, parts, v)
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


CONVERTERS = {
    "tcn": convert_tcn,
    "cnn14": convert_cnn14,
    "umx": convert_umx,
}
