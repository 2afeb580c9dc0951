#!/bin/bash
# TUM-VI benchmark launcher — parity with the reference's
# tum_vi_examples.sh / tum_vi_eval_examples.sh (512x512 KB8 fisheye rig).
#
# Usage: ./scripts/tum_vi_examples.sh <pathDatasetTUM_VI> [vocabulary.npz]
# Sequences expected as <path>/dataset-<name>_512_16 in mav0 layout.

set -e
pathDataset="${1:?usage: tum_vi_examples.sh <pathDatasetTUM_VI> [voc.npz]}"
voc="${2:-}"
vocArg=""
[ -n "$voc" ] && vocArg="--vocabulary $voc"
here="$(cd "$(dirname "$0")" && pwd)"
yaml="/root/reference/Examples/Monocular-Inertial/TUM_512.yaml"

run() { echo "+ $*"; python "$@"; }

# Mono-inertial rooms (the eval rows: room1-6).
for s in room1 room2 room3 room4 room5 room6; do
  run "$here/run_tumvi.py" "$yaml" \
      "$pathDataset/dataset-${s}_512_16" $vocArg \
      --output-name "tumvi_${s}_monoi"
done

# Stereo-inertial flagship rows (magistrale1, outdoors, slides per launcher).
for s in magistrale1 slides1; do
  run "$here/run_tumvi.py" "$yaml" \
      "$pathDataset/dataset-${s}_512_16" --stereo $vocArg \
      --output-name "tumvi_${s}_stereoi"
done
