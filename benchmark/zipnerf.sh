#!/bin/bash
# Train + eval the 4 ZipNeRF scenes (reference benchmark/zipnerf.sh): COLMAP
# captures with fisheye cameras, downsample factor from the reference configs.
# Usage: benchmark/zipnerf.sh <data_root> [config_name] [out_root]
set -e
DATA_ROOT=${1:?usage: zipnerf.sh <data_root> [config] [out]}
CONFIG=${2:-colmap_3dgut}
OUT=${3:-runs/zipnerf}
mkdir -p "$OUT"
for SCENE in alameda berlin london nyc; do
    echo "=== $SCENE ==="
    python train.py --config-name "$CONFIG" \
        path="$DATA_ROOT/$SCENE" out_dir="$OUT" experiment_name="$SCENE" \
        dataset.downsample_factor=2 \
        2>&1 | tee "$OUT/train_$SCENE.log"
done
python benchmark/print_stats.py "$OUT"
