#!/bin/bash
# Download the published eval datasets (Zenodo 8187288)
# (reference scripts/download_eval_datasets.sh). Requires network.
mkdir -p RemFX_eval_datasets
cd RemFX_eval_datasets
for n in 0-0 1-1 2-2 3-3 4-4 5-5; do
  wget -c https://zenodo.org/record/8187288/files/$n.zip
  unzip -o $n.zip
done
