#!/bin/bash
# Evaluate (reference scripts/eval.sh): eval.sh <exp> <N-N> [-ckpt path]
# chain mode:      eval.sh remfx_detect 2-2
# monolithic mode: eval.sh 5-5 2-2 -ckpt logs/ckpts/.../best
set -e
EXP=$1
NN=$2
N1=${NN%-*}
N2=${NN#*-}
export DATASET_ROOT=${DATASET_ROOT:-RemFX_eval_datasets}
shift 2 || true
if [ "$1" = "-ckpt" ]; then
  CKPT=$2
  python scripts/test.py +exp=$EXP +ckpt_path=$CKPT render_files=False \
    "render_root=./$DATASET_ROOT/" \
    "num_kept_effects=[0,0]" "num_removed_effects=[$N1,$N2]" \
    "effects_to_keep=[]" \
    "effects_to_remove=['distortion','compressor','reverb','chorus','delay']"
else
  python scripts/chain_inference.py +exp=$EXP render_files=False \
    "render_root=./$DATASET_ROOT/" \
    "num_removed_effects=[$N1,$N2]"
fi
