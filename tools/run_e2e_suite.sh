#!/bin/bash
# Sequential per-encoding end-to-end drives on the synthetic DOTA devkit
# set (train -> test -> scene merge -> VOC-07 eval). One config at a
# time so chip timing work can interleave between runs.
set -u
cd "$(dirname "$0")/.."
GT=data/dota/val_patches_scene_gt_obb.json
EPOCHS=${EPOCHS:-15}
mkdir -p work_dirs
for cfg in "$@"; do
  name=$(basename "$cfg" .py)
  echo "=== $name ==="
  timeout 3600 python tools/dota_workflow.py "configs/$name.py" \
    --stages train test eval --gt-json "$GT" \
    --total-epochs "$EPOCHS" \
    >"work_dirs/${name}_e2e.log" 2>&1
  echo "=== $name exit=$? ==="
  tail -5 "work_dirs/${name}_e2e.log"
done
