#!/bin/bash
# Train + eval the 6 ScanNet++ benchmark scenes (reference benchmark/scannetpp.sh).
# Usage: benchmark/scannetpp.sh <data_root> [config_name] [out_root]
set -e
DATA_ROOT=${1:?usage: scannetpp.sh <data_root> [config] [out]}
CONFIG=${2:-scannetpp_3dgut}
OUT=${3:-runs/scannetpp}
mkdir -p "$OUT"
for SCENE in 0a5c013435 8d563fc2cc bb87c292ad d415cc449b e8ea9b4da8 fe1733741f; do
    echo "=== $SCENE ==="
    python train.py --config-name "$CONFIG" \
        path="$DATA_ROOT/$SCENE/dslr" out_dir="$OUT" experiment_name="$SCENE" \
        2>&1 | tee "$OUT/train_$SCENE.log"
done
python benchmark/print_stats.py "$OUT"
