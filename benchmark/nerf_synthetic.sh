#!/bin/bash
# Train + eval all 8 NeRF-synthetic scenes (reference benchmark/nerf_synthetic.sh).
# Usage: benchmark/nerf_synthetic.sh <data_root> [config_name] [out_root]
set -e
DATA_ROOT=${1:?usage: nerf_synthetic.sh <data_root> [config] [out]}
CONFIG=${2:-nerf_synthetic_3dgut}
OUT=${3:-runs/nerf_synthetic}
for SCENE in chair drums ficus hotdog lego materials mic ship; do
    echo "=== $SCENE ==="
    python train.py --config-name "$CONFIG" \
        path="$DATA_ROOT/$SCENE" out_dir="$OUT" experiment_name="$SCENE" \
        2>&1 | tee "$OUT/../${SCENE}_train.log"
    python render.py --checkpoint "$OUT/$SCENE/ckpt_last.npz" \
        --path "$DATA_ROOT/$SCENE" --split test \
        --out-dir "$OUT/$SCENE/test_renders" --compute-extra-metrics \
        2>&1 | tee "$OUT/../${SCENE}_eval.log"
done
python benchmark/print_stats.py "$OUT"
