#!/bin/bash
# Download the published torch checkpoints (Zenodo 8218621) for weight
# conversion (reference scripts/download_ckpts.sh). Requires network.
mkdir -p ckpts
cd ckpts
for f in classifier.ckpt dcunet_chorus_aug.ckpt dcunet_delay_aug.ckpt \
         dcunet_reverb_aug.ckpt demucs_compressor_aug.ckpt \
         demucs_distortion_aug.ckpt; do
  wget -c https://zenodo.org/record/8218621/files/$f
done
