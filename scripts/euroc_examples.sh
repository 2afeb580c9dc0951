#!/bin/bash
# EuRoC benchmark launcher — parity with the reference's launcher scripts
# (/root/reference/euroc_examples.sh + euroc_eval_examples.sh): the exact
# benchmark configurations, including the multi-session Atlas rows.
#
# Usage: ./scripts/euroc_examples.sh <pathDatasetEuroc> [vocabulary.npz]
# Sequences are expected as <pathDatasetEuroc>/MH01, MH02, ... in the
# standard mav0 layout. Trajectories land in the current directory as
# f_<name>.txt / kf_<name>.txt; score them with scripts/evaluate_ate.py
# against /root/reference/evaluation/Ground_truth/EuRoC_left_cam/ (visual)
# or the dataset GT (inertial).

set -e
pathDataset="${1:?usage: euroc_examples.sh <pathDatasetEuroc> [voc.npz]}"
voc="${2:-}"
vocArg=""
[ -n "$voc" ] && vocArg="--vocabulary $voc"
here="$(cd "$(dirname "$0")" && pwd)"
yaml_stereo="$here/../configs/EuRoC_stereo.yaml"
yaml_mono="$here/../configs/EuRoC_mono.yaml"
[ -f "$yaml_stereo" ] || yaml_stereo="/root/reference/Examples/Stereo/EuRoC.yaml"
[ -f "$yaml_mono" ] || yaml_mono="/root/reference/Examples/Monocular-Inertial/EuRoC.yaml"

run() { echo "+ $*"; python "$@"; }

# --- Config 1 (eval row 1): MH01 stereo ---
run "$here/run_euroc_stereo_inertial.py" "$yaml_stereo" \
    "$pathDataset/MH01" --no-imu $vocArg --output-name MH01_stereo

# --- Config 2 (eval row 2): MH01-05 multi-session stereo ---
run "$here/run_euroc_stereo_inertial.py" "$yaml_stereo" \
    "$pathDataset/MH01" "$pathDataset/MH02" "$pathDataset/MH03" \
    "$pathDataset/MH04" "$pathDataset/MH05" --no-imu $vocArg \
    --output-name MH01to05_stereo_multi

# --- Config 3 (eval row 3): V102 mono-inertial ---
run "$here/run_euroc_mono_inertial.py" "$yaml_mono" \
    "$pathDataset/V102" $vocArg --output-name V102_monoi

# --- Config 4 (eval row 4): V201-203 multi-session mono-inertial ---
run "$here/run_euroc_mono_inertial.py" "$yaml_mono" \
    "$pathDataset/V201" "$pathDataset/V202" "$pathDataset/V203" \
    $vocArg --output-name V201to203_monoi_multi

# --- Flagship (BASELINE config): MH01-05 stereo-inertial ---
run "$here/run_euroc_stereo_inertial.py" "$yaml_stereo" \
    "$pathDataset/MH01" "$pathDataset/MH02" "$pathDataset/MH03" \
    "$pathDataset/MH04" "$pathDataset/MH05" $vocArg \
    --output-name MH01to05_stereoi
