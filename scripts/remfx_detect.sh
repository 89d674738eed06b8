#!/bin/bash
# Single-file detect+remove (reference scripts/remfx_detect.sh):
#   remfx_detect.sh input.wav [-o output.wav]
set -e
INPUT=$1
shift
OUT=""
while [ $# -gt 0 ]; do
  case "$1" in
    -o) OUT=$2; shift 2;;
    *) shift;;
  esac
done
ARGS="+exp=remfx_detect +audio_input=$INPUT"
if [ -n "$OUT" ]; then ARGS="$ARGS +output_path=$OUT"; fi
python scripts/remfx_detect.py $ARGS
