#!/bin/bash
# Round-4 session-2 suite, part 2: remaining e2e rows with a serial
# --precompile before each train/test (the 4-min warm vs ~20-min
# in-run cold compile, ROUND4_NOTES "tunnel lesson" — must stay
# serial with training, never concurrent).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
GT=data/dota_e2e_xl/val_patches_scene_gt_obb.json
for name in "$@"; do
  if [ -f /tmp/suite_stop2 ]; then echo "=== STOP flag; ending suite ==="; break; fi
  echo "=== $name precompile ($(date +%H:%M)) ==="
  timeout 1800 python tools/train.py "configs/$name.py" \
    --work-dir "work_dirs/$name" --precompile \
    >"work_dirs/${name}_precompile.log" 2>&1
  echo "=== precompile exit=$? ==="
  echo "=== $name workflow ($(date +%H:%M)) ==="
  timeout 4500 python tools/dota_workflow.py "configs/$name.py" \
    --stages train test eval --gt-json "$GT" \
    >"work_dirs/${name}_e2e.log" 2>&1
  echo "=== $name exit=$? ==="
  grep -h "mAP" "work_dirs/${name}_e2e.log" | tail -4
  bash tools/eval_train_scenes.sh "$name" 2>&1 | tail -6
done
echo "=== suite part-2 done $(date) ==="
