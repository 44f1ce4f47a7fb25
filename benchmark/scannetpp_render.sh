#!/bin/bash
# Eval-only pass over trained scannetpp checkpoints (reference scannetpp_render.sh).
# Usage: benchmark/scannetpp_render.sh <result_root> [data_root]
set -e
RESULT_DIR=${1:?usage: scannetpp_render.sh <result_root> [data_root]}
DATA_ROOT=$2
for SCENE in 0a5c013435 8d563fc2cc bb87c292ad d415cc449b e8ea9b4da8 fe1733741f; do
    echo "=== $SCENE ==="
    CKPT=$(find "$RESULT_DIR/$SCENE" -name ckpt_last.npz | head -1)
    ARGS=(--checkpoint "$CKPT" --out-dir "$RESULT_DIR/$SCENE/eval" --compute-extra-metrics)
    [ -n "$DATA_ROOT" ] && ARGS+=(--path "$DATA_ROOT/$SCENE")
    python render.py "${ARGS[@]}" 2>&1 | tee "$RESULT_DIR/render_$SCENE.log"
done
python benchmark/print_stats.py "$RESULT_DIR"
