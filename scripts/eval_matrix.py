#!/usr/bin/env python
"""Table-4-style eval matrix (VERDICT r4 #2): run the composed
detect/oracle/all chains over frozen rendered eval sets at protocol
scale and emit one table of SI-SDR / MR-STFT vs the Input_* baselines.

The reference's standardized eval is `eval.sh {remfx_oracle|remfx_detect|
remfx_all} N-N` over rendered test sets (reference scripts/eval.sh:36-47;
chain semantics remfx/models.py:22-149). This driver reproduces that
protocol as one matrix:

    python scripts/eval_matrix.py \
        --n 0,1,2,5 --variants oracle,detect,all --test-chunks 256 \
        --ckpt RandomPedalboardDistortion=ckpts/tcn_distortion_aug \
        ... --classifier ckpts/classifier_cnn14_r5

Each (variant, N) cell runs in its OWN subprocess: a long single-process
sweep grew host RSS without bound on the tunneled backend (observed
OOM-kill at 130 GB after 4 cells — eager-op buffers the driver never
releases), and per-cell isolation also makes the sweep resumable — cells
already present in --out/eval_matrix.json are skipped. The persistent
compile cache keeps warm across the subprocesses, so isolation costs
seconds, not recompiles.

Datasets are rendered once per N into --root (reference directory
contract) with the rich synthetic source, then reused on later runs.
Results land in --out as eval_matrix.json + eval_matrix.md.
"""

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from remfx_tpu.utils import runtime  # noqa: E402

runtime.setup()

VARIANT_EXP = {
    "oracle": "remfx_oracle",
    "detect": "remfx_detect",
    "all": "remfx_all",
}


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", default="0,1,2,5",
                    help="comma-separated removed-effect counts")
    ap.add_argument("--variants", default="oracle,detect,all")
    ap.add_argument("--test-chunks", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--root", default="data/eval_matrix",
                    help="render root for the frozen eval sets")
    ap.add_argument("--out", default="logs/eval_matrix")
    ap.add_argument("--ckpt", action="append", default=[],
                    metavar="EFFECT_CLASS=PATH",
                    help="vendored ckpt dir per effect class (repeat)")
    ap.add_argument("--classifier", default="ckpts/classifier_cnn14")
    ap.add_argument("--real-files", default="/root/reference/example.wav",
                    help="comma-separated real wavs for the rich source")
    ap.add_argument("--cell", default=None,
                    help="internal: run ONE variant:n cell and print its "
                         "row as the last stdout line")
    return ap.parse_args()


def build_cfg(args, exp_name, n):
    from remfx_tpu.config.core import parse_cli

    argv = [
        f"+exp={exp_name}",
        "render_files=False",
        f"render_root={args.root}",
        f"num_removed_effects=[{n},{n}]",
        f"datamodule.test_batch_size={args.batch}",
        f"datamodule.test_chunks={args.test_chunks}",
        "datamodule.synthetic=true",
        "datamodule.synthetic_rich=true",
        "datamodule.synthetic_real_files=["
        + args.real_files + "]",
        f"classifier_ckpt={args.classifier}",
    ]
    cfg = parse_cli(argv)
    for spec in args.ckpt:
        effect_class, path = spec.split("=", 1)
        if effect_class not in cfg["ckpts"]:
            raise SystemExit(f"unknown effect class {effect_class!r}")
        cfg["ckpts"][effect_class]["ckpt_path"] = path
    return cfg


def ensure_rendered(args, cfg):
    """Render the frozen test set for this N if absent (once per N)."""
    import copy

    from remfx_tpu.train.loop import build_datamodule

    rcfg = copy.deepcopy(cfg)
    rcfg["render_files"] = True
    rcfg["datamodule"]["train_chunks"] = 0
    rcfg["datamodule"]["val_chunks"] = 0
    os.environ.setdefault("REMFX_RENDER_REUSE", "1")
    build_datamodule(rcfg)  # side effect: renders missing splits


def run_cell(args):
    """One (variant, n) evaluation in this process."""
    import numpy as np

    from remfx_tpu.chain.build import build_chain
    from remfx_tpu.train.loop import build_datamodule

    variant, n = args.cell.split(":")
    n = int(n)
    cfg = build_cfg(args, VARIANT_EXP[variant], n)
    ensure_rendered(args, cfg)
    datamodule = build_datamodule(cfg)
    loader = datamodule.test_dataloader()
    t0 = time.time()
    chain = None
    metrics = []
    for batch in loader:
        if chain is None:
            chain = build_chain(cfg, batch[0])
        metrics.append(
            {k: float(v) for k, v in chain.test_step(batch).items()}
        )
    means = {k: float(np.mean([m[k] for m in metrics])) for k in metrics[0]}
    means.update(variant=variant, n=n, examples=args.test_chunks,
                 wall_s=round(time.time() - t0, 1))
    print(json.dumps(means), flush=True)


def write_table(rows, out: Path):
    lines = [
        "| variant | N | SI-SDR | Input_SISDR | dSISDR | MR-STFT "
        "| Input_STFT | dSTFT |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        si, isi = r.get("test_SISDR", 0), r.get("Input_SISDR", 0)
        st, ist = r.get("test_STFT", 0), r.get("Input_STFT", 0)
        lines.append(
            f"| {r['variant']} | {r['n']} | {si:.3f} | {isi:.3f} "
            f"| {si - isi:+.3f} | {st:.3f} | {ist:.3f} | {ist - st:+.3f} |"
        )
    out.write_text("\n".join(lines) + "\n")
    return "\n".join(lines)


def main():
    args = parse_args()
    if args.cell:
        run_cell(args)
        return

    ns = [int(s) for s in args.n.split(",") if s != ""]
    variants = [s for s in args.variants.split(",") if s != ""]
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    rows_path = out / "eval_matrix.json"
    rows = json.loads(rows_path.read_text()) if rows_path.exists() else []
    done = {(r["variant"], r["n"]) for r in rows}

    base_cmd = [sys.executable, str(Path(__file__).resolve())]
    for a in ("n", "variants", "root", "out", "classifier"):
        base_cmd += [f"--{a.replace('_', '-')}", str(getattr(args, a))]
    base_cmd += ["--test-chunks", str(args.test_chunks),
                 "--batch", str(args.batch),
                 "--real-files", args.real_files]
    for spec in args.ckpt:
        base_cmd += ["--ckpt", spec]

    for n in ns:
        for variant in variants:
            if (variant, n) in done:
                print(f"skip {variant}:{n} (already in {rows_path})",
                      flush=True)
                continue
            proc = subprocess.run(
                base_cmd + ["--cell", f"{variant}:{n}"],
                capture_output=True, text=True,
            )
            tail = proc.stdout.strip().splitlines()
            if proc.returncode != 0 or not tail:
                sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
                raise SystemExit(
                    f"cell {variant}:{n} failed (rc={proc.returncode})"
                )
            row = json.loads(tail[-1])
            rows.append(row)
            print(json.dumps(row), flush=True)
            rows_path.write_text(json.dumps(rows, indent=1))

    print(write_table(rows, out / "eval_matrix.md"))


if __name__ == "__main__":
    main()
