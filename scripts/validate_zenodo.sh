#!/bin/bash
# One-command Zenodo validation (round-2 VERDICT next-step #8): the
# moment network access exists, this produces the north-star parity
# numbers against the published reference artifacts.
#
#   1. download the 6 published checkpoints   (Zenodo 8218621)
#   2. download the eval datasets 0-0 .. 5-5  (Zenodo 8187288)
#   3. convert all 6 + per-family torch-vs-flax forward diff
#      (expected tolerances printed per architecture; see
#      scripts/convert_ckpts.py header)
#   4. run the published eval protocol (eval.sh remfx_oracle N-N)
#      -> SI-SDR / MR-STFT rows for BASELINE.md's parity table
#
# Offline behavior: dry-runs to the download step and stops with a
# clear message (wget failure), leaving the repo untouched.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== step 1/4: checkpoints (Zenodo 8218621)"
if ! bash scripts/download_ckpts.sh; then
  echo "download failed — no network? Re-run when networked." >&2
  exit 2
fi

echo "== step 2/4: eval datasets (Zenodo 8187288)"
if ! bash scripts/download_eval_datasets.sh; then
  echo "eval dataset download failed — no network? Re-run when networked." >&2
  exit 2
fi

echo "== step 3/4: convert + verify"
python scripts/convert_ckpts.py --verify

echo "== step 4/4: published eval protocol (remfx_oracle, N removed effects)"
export DATASET_ROOT=RemFX_eval_datasets
for N in 0 1 2 3 4 5; do
  bash scripts/eval.sh remfx_oracle "$N-$N"
done
echo "done — fill BASELINE.md's parity table from the metric logs above"
