#!/bin/bash
# Sequential per-encoding end-to-end drives on the synthetic DOTA devkit
# set (train -> test -> scene merge -> VOC-07 eval). One config at a
# time so chip timing work can interleave between runs.
set -u
cd "$(dirname "$0")/.."
GT=${GT:-data/dota_e2e_xl/val_patches_scene_gt_obb.json}
# persistent compile cache: re-runs of a config skip the ~25 min
# remote train-step compile
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
mkdir -p work_dirs
for cfg in "$@"; do
  name=$(basename "$cfg" .py)
  echo "=== $name ==="
  # configs carry their own schedule (total_epochs/lr tuned per
  # config); no autoscale -- the e2e lr is already per-chip
  timeout 7200 python tools/dota_workflow.py "configs/$name.py" \
    --stages train test eval --gt-json "$GT" \
    >"work_dirs/${name}_e2e.log" 2>&1
  echo "=== $name exit=$? ==="
  tail -5 "work_dirs/${name}_e2e.log"
done
