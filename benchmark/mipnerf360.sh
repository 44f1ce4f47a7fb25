#!/bin/bash
# Train + eval MipNeRF-360 scenes (reference benchmark/mipnerf360.sh).
set -e
DATA_ROOT=${1:?usage: mipnerf360.sh <data_root> [config] [out]}
CONFIG=${2:-colmap_3dgut}
OUT=${3:-runs/mipnerf360}
for SCENE in bicycle bonsai counter flowers garden kitchen room stump treehill; do
    echo "=== $SCENE ==="
    case $SCENE in
        bicycle|flowers|garden|stump|treehill) DS=4 ;;
        *) DS=2 ;;
    esac
    python train.py --config-name "$CONFIG" \
        path="$DATA_ROOT/$SCENE" out_dir="$OUT" experiment_name="$SCENE" \
        dataset.downsample_factor=$DS 2>&1 | tee "$OUT/../${SCENE}_train.log"
    python render.py --checkpoint "$OUT/$SCENE/ckpt_last.npz" \
        --path "$DATA_ROOT/$SCENE" --dataset-type colmap --split val \
        --out-dir "$OUT/$SCENE/test_renders" \
        2>&1 | tee "$OUT/../${SCENE}_eval.log"
done
python benchmark/print_stats.py "$OUT"
