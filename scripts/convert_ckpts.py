#!/usr/bin/env python
"""Convert the published torch checkpoints (Zenodo 8218621, reference
scripts/download_ckpts.sh) into orbax variable directories, with
optional torch-oracle forward-parity verification.

Usage:
  python scripts/convert_ckpts.py [--verify] [--out-dir ckpts/converted]
                                  [files.ckpt ...]

With no file arguments, converts every ``ckpts/*.ckpt``. Conversion is
optional for running the chain — ``build_chain`` imports torch .ckpt
files in memory — but the converted dirs load faster and ``--verify``
produces the parity evidence (max |torch - flax| over a fixed input)
that BASELINE.md's Zenodo table needs.

Per-architecture expected tolerances (fp32, 262144-sample input):
  demucs  <= 2e-4  (BiLSTM scan ordering; tests/test_demucs_parity.py)
  dcunet  <= 1e-4  (tests/test_dcunet_parity.py)
  cnn14   structural check only (conv-block numerics covered by
          tests/test_compat.py; no full in-repo torch oracle)
"""

import argparse
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from remfx_tpu.utils import runtime  # noqa: E402

runtime.setup()


# the Zenodo checkpoints' published architectures (reference
# cfg/model/{demucs,dcunet}.yaml, cfg/exp/remfx_detect.yaml)
NETWORK_CFG = {
    "demucs": dict(sources=("mixture",), audio_channels=1, nfft=4096,
                   channels=48),
    "dcunet": dict(architecture="Large-DCUNet-20", stft_kernel_size=512,
                   fix_length_mode="pad"),
    "cnn14": dict(num_classes=5, sample_rate=48000, model_sample_rate=48000,
                  n_fft=2048, hop_length=512, n_mels=128, specaugment=True),
}


def _build(kind: str):
    import jax

    from remfx_tpu.models import make_cnn14, make_model

    if kind == "cnn14":
        net = make_cnn14(**NETWORK_CFG["cnn14"])

        class _W:  # minimal init shim so one code path serves both
            module = net

            @staticmethod
            def init(key, x):
                return net.init({"params": key}, x, False)

        return _W()
    return make_model(kind, **NETWORK_CFG[kind])


def _verify(kind: str, sd: dict, variables: dict, wrapper) -> float | None:
    """Forward parity vs the in-repo torch oracle (max abs diff), or
    None when no full oracle exists for this family."""
    import numpy as np
    import torch

    sys.path.insert(0, str(REPO / "tests"))
    rng = np.random.default_rng(0)
    x = (0.1 * rng.standard_normal((1, 262144))).astype(np.float32)

    if kind == "dcunet":
        from _torch_dcunet import TorchDCUNet

        from remfx_tpu.compat.torch_import import detect_dcunet_norm_type
        from remfx_tpu.models.dcunet import (
            DCUNET_ARCHITECTURES,
            _stft_filters,
        )

        tm = TorchDCUNet(DCUNET_ARCHITECTURES["Large-DCUNet-20"], 512,
                         norm_type=detect_dcunet_norm_type(sd),
                         filters=_stft_filters(512))
        tm.load_state_dict(
            {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()
             if not k.endswith("num_batches_tracked")
             and k.startswith("masker.")},
            strict=False,
        )
        tm.eval()
        with torch.no_grad():
            ref = tm(torch.from_numpy(x)).numpy()
        out = np.asarray(wrapper.sample(variables, x[None]))[:, 0]
    elif kind == "demucs":
        from _torch_hdemucs import HDemucs as TorchHDemucs

        tm = TorchHDemucs(**NETWORK_CFG["demucs"])
        renames = {"encoder.": "freq_encoder.", "decoder.": "freq_decoder.",
                   "tencoder.": "time_encoder.", "tdecoder.": "time_decoder."}
        tsd = {}
        for k, v in sd.items():
            if k.endswith("num_batches_tracked"):
                continue
            for old, new in renames.items():
                if k.startswith(old):
                    k = new + k[len(old):]
                    break
            tsd[k] = torch.from_numpy(np.asarray(v))
        missing, unexpected = tm.load_state_dict(tsd, strict=False)
        if missing or unexpected:
            print(f"  oracle key mismatch: missing={list(missing)[:4]} "
                  f"unexpected={list(unexpected)[:4]}")
        tm.eval()
        with torch.no_grad():
            ref = tm(torch.from_numpy(x[None])).numpy()[:, 0]
        out = np.asarray(wrapper.sample(variables, x[None]))
    else:
        return None
    return float(np.max(np.abs(ref - np.asarray(out).reshape(ref.shape))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="*", help=".ckpt files (default ckpts/*.ckpt)")
    ap.add_argument("--out-dir", default="ckpts/converted")
    ap.add_argument("--verify", action="store_true",
                    help="torch-oracle forward parity (needs torch)")
    args = ap.parse_args()

    import jax

    from remfx_tpu.compat.torch_import import (
        check_structure,
        detect_kind,
        load_torch_state_dict,
        strip_prefix,
    )
    from remfx_tpu.compat.torch_import import CONVERTERS

    files = [Path(f) for f in args.files] or sorted(
        Path("ckpts").glob("*.ckpt"))
    if not files:
        print("no .ckpt files found (run scripts/download_ckpts.sh first)")
        return 1

    import orbax.checkpoint as ocp

    failures = 0
    for f in files:
        print(f"== {f}")
        sd = strip_prefix(load_torch_state_dict(str(f)))
        kind = detect_kind(sd)
        variables = CONVERTERS[kind](sd)
        wrapper = _build(kind)
        template = wrapper.init(jax.random.PRNGKey(0),
                                0.01 * jax.numpy.ones((1, 1, 8192)))
        check_structure(variables, jax.device_get(template))
        print(f"  kind={kind}: structure OK "
              f"({len(jax.tree.leaves(variables))} arrays)")
        out = Path(args.out_dir).resolve() / f.stem
        ckptr = ocp.StandardCheckpointer()
        if out.exists():
            import shutil

            shutil.rmtree(out)
        ckptr.save(out, jax.device_get(variables))
        ckptr.wait_until_finished()
        print(f"  saved {out}")
        if args.verify:
            diff = _verify(kind, sd, variables, wrapper)
            if diff is None:
                print("  verify: no full torch oracle for this family "
                      "(structural check only)")
            else:
                tol = {"demucs": 2e-4, "dcunet": 1e-4}.get(kind, 1e-3)
                status = "OK" if diff <= tol else "FAIL"
                if status == "FAIL":
                    failures += 1
                print(f"  verify: max|torch-flax| = {diff:.2e} "
                      f"(tol {tol:.0e}) {status}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
