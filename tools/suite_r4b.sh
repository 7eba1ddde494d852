#!/bin/bash
# Round-4 session-2 suite: the 6 queued e2e rows, highest table value
# first; after each train/test/eval the same checkpoint is re-tested
# on train scenes (capacity protocol) while its programs are warm.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
GT=data/dota_e2e_xl/val_patches_scene_gt_obb.json
for name in dota_mask_obb_r18_e2e dota_h_obb_r18_e2e \
    dota_h_obb_robust_r18_e2e dota_centermap_net_r18_e2e \
    dota_rroi_point_obb_r18_e2e dota_retinanet_theta_obb_r18_e2e; do
  if [ -f /tmp/suite_stop ]; then echo "=== STOP flag; ending suite ==="; break; fi
  echo "=== $name ($(date +%H:%M)) ==="
  timeout 4500 python tools/dota_workflow.py "configs/$name.py" \
    --stages train test eval --gt-json "$GT" \
    >"work_dirs/${name}_e2e.log" 2>&1
  echo "=== $name exit=$? ==="
  grep -h "mAP" "work_dirs/${name}_e2e.log" | tail -4
  bash tools/eval_train_scenes.sh "$name" 2>&1 | tail -6
done
echo "=== suite done $(date) ==="
