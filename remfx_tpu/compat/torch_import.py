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
    return {
        k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        for k, v in sd.items()
    }


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


# ------------------------------------------------------------------ demucs
#
# torchaudio.models.HDemucs (the reference's demucs backbone,
# remfx/models.py:307-324) — see compat/MAPPING.md for the full
# layer-by-layer table. torchaudio names the four ModuleLists
# freq_encoder/freq_decoder/time_encoder/time_decoder; the upstream
# demucs v3 code uses encoder/decoder/tencoder/tdecoder. Both spellings
# are accepted (auto-detected per key).

_DEMUCS_LIST_ALIASES = {
    "encoder": "freq_encoder",
    "decoder": "freq_decoder",
    "tencoder": "time_encoder",
    "tdecoder": "time_decoder",
    "freq_encoder": "freq_encoder",
    "freq_decoder": "freq_decoder",
    "time_encoder": "time_encoder",
    "time_decoder": "time_decoder",
}


def _conv_w(v):
    """torch conv weight -> flax kernel (works for 1d and 2d)."""
    if v.ndim == 3:  # (out, in, k) -> (k, in, out)
        return v.transpose(2, 1, 0)
    return v.transpose(2, 3, 1, 0)  # (out, in, kh, kw) -> (kh, kw, in, out)


def _convtr_w(v):
    """torch ConvTranspose weight -> our (k, in, out) tap-order param."""
    if v.ndim == 4:  # (in, out, k, 1)
        v = v[..., 0]
    return v.transpose(2, 0, 1)  # (in, out, k) -> (k, in, out)


def _convert_dconv_group(group: dict) -> dict:
    """dconv.layers.{d}.{j}.<rest> entries -> flax dconv subtree.

    The torch Sequential indices shift with the lstm/attn inserts, so
    roles are recovered from each entry's signature instead of its
    index: conv kernels by their width (3 = conv1, 1 = conv2), norms by
    order, BLSTM/LocalState by their member names, LayerScale by
    ``scale``."""
    out: dict = {}
    for d in sorted({k.split(".")[0] for k in group}):
        entries: dict = {}
        for k, v in group.items():
            if k.split(".")[0] != d:
                continue
            rest = k.split(".")[1:]
            entries.setdefault(rest[0], {})[".".join(rest[1:])] = v
        norms_seen = 0
        for j in sorted(entries, key=int):
            e = entries[j]
            if "scale" in e:
                out[f"layers{d}_scale"] = e["scale"]
            elif any(k_.startswith("lstm.") for k_ in e):
                lstm = {k_.split(".", 1)[1]: v for k_, v in e.items()
                        if k_.startswith("lstm.")}
                out[f"layers{d}_lstm"] = {
                    "lstm": lstm,
                    "linear": {"kernel": e["linear.weight"].T,
                               "bias": e["linear.bias"]},
                }
            elif "content.weight" in e:
                attn = {}
                for name in ("content", "query", "key", "query_decay", "proj"):
                    if f"{name}.weight" in e:
                        attn[name] = {
                            "kernel": e[f"{name}.weight"][..., 0].T,
                            "bias": e[f"{name}.bias"],
                        }
                out[f"layers{d}_attn"] = attn
            elif "weight" in e and e["weight"].ndim == 3:
                role = "conv1" if e["weight"].shape[-1] > 1 else "conv2"
                out[f"layers{d}_{role}"] = {
                    "kernel": _conv_w(e["weight"]), "bias": e["bias"],
                }
            elif "weight" in e:  # GroupNorm
                role = "norm1" if norms_seen == 0 else "norm2"
                norms_seen += 1
                out[f"layers{d}_{role}"] = {
                    "scale": e["weight"], "bias": e["bias"],
                }
    return out


def convert_demucs(sd: dict) -> dict:
    """torchaudio HDemucs state dict -> {'params': ...} for
    models/demucs.py. Layouts: conv (k[,1],in,out); conv_tr kept in
    torch tap order as (k,in,out); LocalState 1x1 convs -> Dense."""
    params: dict = {}
    # group keys per layer
    layers: dict = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        parts = k.split(".")
        if parts[0] == "freq_emb":
            _set(params, ["freq_emb", "weight"], v)
            continue
        alias = _DEMUCS_LIST_ALIASES.get(parts[0])
        if alias is None:
            continue
        lname = f"{alias}_{parts[1]}"
        layers.setdefault(lname, {})[".".join(parts[2:])] = v

    for lname, entries in layers.items():
        dconv_group = {}
        for k, v in entries.items():
            parts = k.split(".")
            if parts[0] == "conv":
                _set(params, [lname, "conv",
                              "kernel" if parts[1] == "weight" else "bias"],
                     _conv_w(v) if parts[1] == "weight" else v)
            elif parts[0] == "conv_tr":
                if parts[1] == "weight":
                    _set(params, [lname, "conv_tr_kernel"], _convtr_w(v))
                else:
                    _set(params, [lname, "conv_tr_bias"], v)
            elif parts[0] in ("norm1", "norm2"):
                _set(params, [lname, parts[0],
                              "scale" if parts[1] == "weight" else "bias"], v)
            elif parts[0] == "rewrite":
                _set(params, [lname, "rewrite",
                              "kernel" if parts[1] == "weight" else "bias"],
                     _conv_w(v) if parts[1] == "weight" else v)
            elif parts[0] == "dconv":
                assert parts[1] == "layers"
                dconv_group[".".join(parts[2:])] = v
        if dconv_group:
            _set(params, [lname, "dconv"], _convert_dconv_group(dconv_group))
    return {"params": params}


def export_demucs(variables: dict, style: str = "torchaudio") -> dict:
    """models/demucs.py params -> torch-named numpy state dict (the
    exact inverse of ``convert_demucs``; used for round-trip tests and
    exporting trained weights back to the torch ecosystem)."""
    inv_alias = {
        "freq_encoder": "freq_encoder" if style == "torchaudio" else "encoder",
        "freq_decoder": "freq_decoder" if style == "torchaudio" else "decoder",
        "time_encoder": "time_encoder" if style == "torchaudio" else "tencoder",
        "time_decoder": "time_decoder" if style == "torchaudio" else "tdecoder",
    }
    sd: dict = {}
    params = variables["params"]

    def conv_w_inv(k):
        if k.ndim == 3:
            return k.transpose(2, 1, 0)
        return k.transpose(3, 2, 0, 1)

    def emit_dconv(prefix, tree, freq_is_2d=False):
        ds = sorted({int(n.split("_")[0][6:]) for n in tree})
        for d in ds:
            has_lstm = f"layers{d}_lstm" in tree
            has_attn = f"layers{d}_attn" in tree
            idx_conv2 = 3 + has_lstm + has_attn
            sd[f"{prefix}.{d}.0.weight"] = conv_w_inv(
                np.asarray(tree[f"layers{d}_conv1"]["kernel"]))
            sd[f"{prefix}.{d}.0.bias"] = np.asarray(
                tree[f"layers{d}_conv1"]["bias"])
            sd[f"{prefix}.{d}.1.weight"] = np.asarray(
                tree[f"layers{d}_norm1"]["scale"])
            sd[f"{prefix}.{d}.1.bias"] = np.asarray(
                tree[f"layers{d}_norm1"]["bias"])
            if has_lstm:
                sub = tree[f"layers{d}_lstm"]
                for k_, v_ in sub["lstm"].items():
                    sd[f"{prefix}.{d}.3.lstm.{k_}"] = np.asarray(v_)
                sd[f"{prefix}.{d}.3.linear.weight"] = np.asarray(
                    sub["linear"]["kernel"]).T
                sd[f"{prefix}.{d}.3.linear.bias"] = np.asarray(
                    sub["linear"]["bias"])
            if has_attn:
                j = 3 + has_lstm
                sub = tree[f"layers{d}_attn"]
                for name, leaf in sub.items():
                    sd[f"{prefix}.{d}.{j}.{name}.weight"] = np.asarray(
                        leaf["kernel"]).T[..., None]
                    sd[f"{prefix}.{d}.{j}.{name}.bias"] = np.asarray(
                        leaf["bias"])
            sd[f"{prefix}.{d}.{idx_conv2}.weight"] = conv_w_inv(
                np.asarray(tree[f"layers{d}_conv2"]["kernel"]))
            sd[f"{prefix}.{d}.{idx_conv2}.bias"] = np.asarray(
                tree[f"layers{d}_conv2"]["bias"])
            sd[f"{prefix}.{d}.{idx_conv2 + 1}.weight"] = np.asarray(
                tree[f"layers{d}_norm2"]["scale"])
            sd[f"{prefix}.{d}.{idx_conv2 + 1}.bias"] = np.asarray(
                tree[f"layers{d}_norm2"]["bias"])
            sd[f"{prefix}.{d}.{idx_conv2 + 3}.scale"] = np.asarray(
                tree[f"layers{d}_scale"])

    for lname, tree in params.items():
        if lname == "freq_emb":
            key = ("freq_emb.embedding.weight" if style == "torchaudio"
                   else "freq_emb.embedding.weight")
            sd[key] = np.asarray(tree["weight"])
            continue
        base, idx = lname.rsplit("_", 1)
        tname = f"{inv_alias[base]}.{idx}"
        freq_is_2d = False
        for sub, leafs in tree.items():
            if sub == "conv":
                k = np.asarray(leafs["kernel"])
                freq_is_2d = k.ndim == 4
                sd[f"{tname}.conv.weight"] = conv_w_inv(k)
                sd[f"{tname}.conv.bias"] = np.asarray(leafs["bias"])
            elif sub == "rewrite":
                sd[f"{tname}.rewrite.weight"] = conv_w_inv(
                    np.asarray(leafs["kernel"]))
                sd[f"{tname}.rewrite.bias"] = np.asarray(leafs["bias"])
            elif sub in ("norm1", "norm2"):
                sd[f"{tname}.{sub}.weight"] = np.asarray(leafs["scale"])
                sd[f"{tname}.{sub}.bias"] = np.asarray(leafs["bias"])
        if "conv_tr_kernel" in tree:
            k = np.asarray(tree["conv_tr_kernel"]).transpose(1, 2, 0)
            # a freq_decoder position is freq=True (2d ConvTranspose,
            # kernel (in, out, k, 1)) iff its rewrite is the 3x3 2d conv;
            # position 0 (the time-axis layer) and all time_decoder_*
            # (incl. the rewrite-less empty one) are ConvTranspose1d
            if base == "freq_decoder" and "rewrite" in tree and np.asarray(
                tree["rewrite"]["kernel"]
            ).ndim == 4:
                k = k[..., None]
            sd[f"{tname}.conv_tr.weight"] = k
            sd[f"{tname}.conv_tr.bias"] = np.asarray(tree["conv_tr_bias"])
        if "dconv" in tree:
            emit_dconv(f"{tname}.dconv.layers", tree["dconv"], freq_is_2d)
    return sd


# ------------------------------------------------------------------ dcunet
#
# asteroid.models.DCUNet (reference remfx/models.py:347-367) — learnable
# weights live under masker.*; encoder/decoder filterbanks are fixed
# STFT buffers (regenerated, never imported). See compat/MAPPING.md.


def _complex_conv_pair(e: dict, transpose: bool) -> dict:
    out = {}
    for part in ("re", "im"):
        w = e[f"{part}_module.weight"]
        if transpose:  # (in, out, kh, kw) -> (kh, kw, in, out), tap order
            out[f"{part}_kernel"] = w.transpose(2, 3, 0, 1)
        else:  # (out, in, kh, kw) -> (kh, kw, in, out)
            out[f"{part}_kernel"] = w.transpose(2, 3, 1, 0)
        if f"{part}_module.bias" in e:
            out[f"{part}_bias"] = e[f"{part}_module.bias"]
    return out


def convert_dcunet(sd: dict) -> dict:
    """asteroid DCUNet state dict -> {'params', 'batch_stats'} for
    models/dcunet.py. Auto-detects the norm flavor: re_module/im_module
    BatchNorm pairs ('bN') vs ComplexBatchNorm weight (C, 3) ('CbN')."""
    params: dict = {}
    stats: dict = {}
    groups: dict = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        parts = k.split(".")
        if parts[0] != "masker":
            continue  # encoder/decoder filterbank buffers: regenerated
        if parts[1] == "mask_bias":
            # remfx_tpu container extension (see export_dcunet): the
            # identity-init mask bias has no slot in the stock asteroid
            # format; round-trips of OUR trained ckpts carry it here.
            # Published Zenodo files never contain this key.
            params["mask_bias"] = v
            continue
        if parts[1] == "encoders":
            lname = f"enc{parts[2]}"
            rest = parts[3:]
        elif parts[1] == "decoders":
            lname = f"dec{parts[2]}"
            rest = parts[3:]
        elif parts[1] == "output_layer":
            lname = "output"
            rest = parts[2:]
        else:
            continue
        groups.setdefault(lname, {})[".".join(rest)] = v

    for lname, entries in groups.items():
        conv_entries = {k.split(".", 1)[1]: v for k, v in entries.items()
                        if k.split(".")[0] in ("conv", "deconv")}
        if lname == "output":
            # plain ComplexConvTranspose2d, no norm wrapper
            conv_entries = conv_entries or entries
            params["output_conv"] = _complex_conv_pair(
                conv_entries, transpose=True)
            continue
        transpose = lname.startswith("dec")
        params[f"{lname}_conv"] = _complex_conv_pair(conv_entries, transpose)
        norm_entries = {k.split(".", 1)[1]: v for k, v in entries.items()
                        if k.startswith("norm.")}
        if not norm_entries:
            continue
        if "weight" in norm_entries and norm_entries["weight"].ndim == 2:
            # ComplexBatchNorm: weight (C,3), bias (C,2)
            params[f"{lname}_norm"] = {
                "weight": norm_entries["weight"],
                "bias": norm_entries["bias"],
            }
            _set(stats, [f"{lname}_norm", "running_mean"],
                 norm_entries["running_mean"])
            _set(stats, [f"{lname}_norm", "running_covar"],
                 norm_entries["running_covar"])
        else:  # OnReIm BatchNorm pair
            for part in ("re", "im"):
                _set(params, [f"{lname}_norm", f"{part}_module"], {
                    "scale": norm_entries[f"{part}_module.weight"],
                    "bias": norm_entries[f"{part}_module.bias"],
                })
                _set(stats, [f"{lname}_norm", f"{part}_module"], {
                    "mean": norm_entries[f"{part}_module.running_mean"],
                    "var": norm_entries[f"{part}_module.running_var"],
                })
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def detect_dcunet_norm_type(sd: dict) -> str:
    """'bN' or 'CbN' from a masker state dict's norm parameter shapes."""
    for k, v in sd.items():
        if ".norm.re_module.weight" in k:
            return "bN"
        if k.endswith(".norm.weight") and getattr(v, "ndim", 1) == 2:
            return "CbN"
    return "bN"


def export_dcunet(variables: dict) -> dict:
    """Inverse of convert_dcunet (round-trip tests / torch export)."""
    sd: dict = {}
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def emit_conv(tname, tree, transpose):
        for part in ("re", "im"):
            k = np.asarray(tree[f"{part}_kernel"])
            if transpose:
                w = k.transpose(2, 3, 0, 1)
            else:
                w = k.transpose(3, 2, 0, 1)
            sd[f"{tname}.{part}_module.weight"] = w
            if f"{part}_bias" in tree:
                sd[f"{tname}.{part}_module.bias"] = np.asarray(
                    tree[f"{part}_bias"])

    for lname, tree in params.items():
        if lname == "mask_bias":
            # identity-init extension: no asteroid slot exists (the
            # output layer is bias-free), so carry it verbatim under a
            # namespaced key our convert_dcunet re-imports. A stock
            # asteroid load_state_dict(strict=True) will reject such a
            # file — by design: silently dropping it would change the
            # mask function.
            sd["masker.mask_bias"] = np.asarray(tree)
            continue
        if lname == "output_conv":
            emit_conv("masker.output_layer", tree, transpose=True)
            continue
        kind, idx = lname[:3], lname[3:].split("_")[0]
        if lname.endswith("_conv"):
            base = ("masker.encoders" if kind == "enc" else "masker.decoders")
            attr = "conv" if kind == "enc" else "deconv"
            emit_conv(f"{base}.{idx}.{attr}", tree, transpose=kind == "dec")
        elif lname.endswith("_norm"):
            base = ("masker.encoders" if kind == "enc" else "masker.decoders")
            tstat = stats.get(lname, {})
            if "weight" in tree:  # CbN
                sd[f"{base}.{idx}.norm.weight"] = np.asarray(tree["weight"])
                sd[f"{base}.{idx}.norm.bias"] = np.asarray(tree["bias"])
                sd[f"{base}.{idx}.norm.running_mean"] = np.asarray(
                    tstat["running_mean"])
                sd[f"{base}.{idx}.norm.running_covar"] = np.asarray(
                    tstat["running_covar"])
            else:
                for part in ("re", "im"):
                    sub, sstat = tree[f"{part}_module"], tstat[f"{part}_module"]
                    sd[f"{base}.{idx}.norm.{part}_module.weight"] = np.asarray(
                        sub["scale"])
                    sd[f"{base}.{idx}.norm.{part}_module.bias"] = np.asarray(
                        sub["bias"])
                    sd[f"{base}.{idx}.norm.{part}_module.running_mean"] = (
                        np.asarray(sstat["mean"]))
                    sd[f"{base}.{idx}.norm.{part}_module.running_var"] = (
                        np.asarray(sstat["var"]))
    return sd


# ------------------------------------------------------------------ dptnet
#
# asteroid.models.dptnet.DPTNet (reference remfx/models.py:327-344).
# All torch layouts are kept verbatim in the flax params (UMX-style), so
# conversion is a pure re-rooting. See compat/MAPPING.md.

_DPT_SIMPLE = {
    "encoder.filterbank._filters": "encoder_filters",
    "decoder.filterbank._filters": "decoder_filters",
    "masker.first_out.0.weight": "first_out_prelu",
    "masker.first_out.1.weight": "first_out_weight",
    "masker.first_out.1.bias": "first_out_bias",
    "masker.net_out.0.weight": "net_out_weight",
    "masker.net_out.0.bias": "net_out_bias",
    "masker.net_gate.0.weight": "net_gate_weight",
    "masker.net_gate.0.bias": "net_gate_bias",
}


def convert_dptnet(sd: dict) -> dict:
    """asteroid DPTNet state dict -> {'params': ...} (models/dptnet.py)."""
    params: dict = {}
    for k, v in sd.items():
        if k in _DPT_SIMPLE:
            _set(params, [_DPT_SIMPLE[k]], v)
            continue
        parts = k.split(".")
        if parts[:2] == ["masker", "in_norm"]:
            _set(params, ["in_norm", parts[2]], v)
        elif parts[:2] == ["masker", "layers"]:
            r, which = parts[2], "intra" if parts[3] == "0" else "inter"
            lname = f"layers_{r}_{which}"
            sub = parts[4]
            if sub == "mha":
                if parts[5] == "out_proj":
                    _set(params, [lname, "mha", f"out_proj_{parts[6]}"], v)
                else:
                    _set(params, [lname, "mha", parts[5]], v)
            elif sub == "recurrent":
                _set(params, [lname, "recurrent", parts[5]], v)
            elif sub == "linear":
                _set(params, [lname, f"linear_{parts[5]}"], v)
            elif sub in ("norm_mha", "norm_ff"):
                _set(params, [lname, sub, parts[5]], v)
    return {"params": params}


def export_dptnet(variables: dict) -> dict:
    """Inverse of convert_dptnet."""
    sd: dict = {}
    params = variables["params"]
    inv = {v: k for k, v in _DPT_SIMPLE.items()}
    for name, tree in params.items():
        if name in inv:
            sd[inv[name]] = np.asarray(tree)
        elif name == "in_norm":
            for p, v in tree.items():
                sd[f"masker.in_norm.{p}"] = np.asarray(v)
        elif name.startswith("layers_"):
            _, r, which = name.split("_")
            j = "0" if which == "intra" else "1"
            base = f"masker.layers.{r}.{j}"
            for sub, leafs in tree.items():
                if sub == "mha":
                    for p, v in leafs.items():
                        if p.startswith("out_proj_"):
                            sd[f"{base}.mha.out_proj.{p[9:]}"] = np.asarray(v)
                        else:
                            sd[f"{base}.mha.{p}"] = np.asarray(v)
                elif sub == "recurrent":
                    for p, v in leafs.items():
                        sd[f"{base}.recurrent.{p}"] = np.asarray(v)
                elif sub in ("norm_mha", "norm_ff"):
                    for p, v in leafs.items():
                        sd[f"{base}.{sub}.{p}"] = np.asarray(v)
            for p in ("linear_weight", "linear_bias"):
                if p in tree:
                    sd[f"{base}.linear.{p[7:]}"] = np.asarray(tree[p])
    return sd


CONVERTERS = {
    "tcn": convert_tcn,
    "cnn14": convert_cnn14,
    "umx": convert_umx,
    "demucs": convert_demucs,
    "dcunet": convert_dcunet,
    "dptnet": convert_dptnet,
}


def detect_kind(sd: dict) -> str:
    """Infer the backbone family from a (prefix-stripped) state dict's
    key fingerprint — filename-independent, so renamed Zenodo downloads
    still convert (scripts/download_ckpts.sh names are the common case:
    classifier=Cnn14, dcunet_*, demucs_*)."""
    keys = set(sd)
    if any(k.startswith("masker.encoders") for k in keys):
        return "dcunet"
    # dptnet must be fingerprinted before demucs: asteroid DPTNet dicts
    # contain "encoder.filterbank._filters", which the demucs "encoder."
    # prefix check would otherwise claim
    if any(".mha.in_proj_weight" in k for k in keys):
        return "dptnet"
    if any(
        k.startswith(("freq_emb.", "tencoder.", "encoder.", "freq_encoder.",
                      "time_encoder."))
        for k in keys
    ):
        return "demucs"
    if any(k.startswith("conv_block1.") for k in keys):
        return "cnn14"
    if any(k.startswith("process_blocks.") for k in keys):
        return "tcn"
    if any(k.startswith(("lstm.weight_ih_l0", "fc1.weight", "bn1.")) for k in keys):
        return "umx"
    raise ValueError(
        "unrecognized checkpoint family; state-dict keys start with: "
        + ", ".join(sorted({k.split('.')[0] for k in keys})[:12])
    )


def import_torch_checkpoint(path: str, kind: str | None = None):
    """torch/Lightning .ckpt file -> (kind, flax variables pytree).

    The one-call import path used by chain building and
    scripts/convert_ckpts.py: unpickle (torch CPU), strip Lightning
    wrapper prefixes, detect the backbone family, convert layouts.
    """
    sd = strip_prefix(load_torch_state_dict(path))
    kind = kind or detect_kind(sd)
    return kind, CONVERTERS[kind](sd)


def check_structure(converted, template) -> None:
    """Fail loudly when a converted tree does not match the module's
    init structure (the reference's load_state_dict crashes the same
    way; a silent partial load would eval random weights)."""
    import jax

    def leaves(tree):
        return {
            "/".join(str(getattr(k, "key", k)) for k in p): leaf
            for p, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    conv, tmpl = leaves(converted), leaves(template)
    missing = sorted(set(tmpl) - set(conv))
    extra = sorted(set(conv) - set(tmpl))
    # load_state_dict is also strict about shapes: a checkpoint converted
    # against the wrong architecture config must not pass here and
    # broadcast/crash later at apply time
    shape_errs = [
        (p, tuple(getattr(conv[p], "shape", ())), tuple(getattr(tmpl[p], "shape", ())))
        for p in sorted(set(conv) & set(tmpl))
        if tuple(getattr(conv[p], "shape", ())) != tuple(getattr(tmpl[p], "shape", ()))
    ]
    if missing or extra or shape_errs:
        raise ValueError(
            f"converted checkpoint structure mismatch: "
            f"missing={missing[:8]}{'...' if len(missing) > 8 else ''} "
            f"extra={extra[:8]}{'...' if len(extra) > 8 else ''} "
            f"shape_mismatch={shape_errs[:8]}{'...' if len(shape_errs) > 8 else ''}"
        )
