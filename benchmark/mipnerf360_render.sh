#!/bin/bash
# Eval-only pass over trained mipnerf360 checkpoints (reference mipnerf360_render.sh).
# Usage: benchmark/mipnerf360_render.sh <result_root> [data_root]
set -e
RESULT_DIR=${1:?usage: mipnerf360_render.sh <result_root> [data_root]}
DATA_ROOT=$2
for SCENE in bicycle bonsai counter flowers garden kitchen room stump treehill; do
    echo "=== $SCENE ==="
    CKPT=$(find "$RESULT_DIR/$SCENE" -name ckpt_last.npz | head -1)
    ARGS=(--checkpoint "$CKPT" --out-dir "$RESULT_DIR/$SCENE/eval" --compute-extra-metrics)
    [ -n "$DATA_ROOT" ] && ARGS+=(--path "$DATA_ROOT/$SCENE")
    python render.py "${ARGS[@]}" 2>&1 | tee "$RESULT_DIR/render_$SCENE.log"
done
python benchmark/print_stats.py "$RESULT_DIR"
