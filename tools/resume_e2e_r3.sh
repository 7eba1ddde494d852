#!/bin/bash
# Round-3 e2e suite (rerun after the tunnel outage): theta needs only
# test+eval (checkpoint preserved in work_dirs/theta_e2e_v2); the rest
# run the full train->test->eval workflow, including the robust-hobb
# A/B row.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
GT=data/dota_e2e/val_patches_scene_gt_obb.json
if ! ls work_dirs/theta_e2e_v2/ap_obb* >/dev/null 2>&1; then
  echo "=== theta resume (test+eval) ==="
  timeout 3600 python tools/dota_workflow.py configs/dota_theta_obb_r18_e2e.py \
    --work-dir work_dirs/theta_e2e_v2 --stages test eval --gt-json "$GT" \
    >work_dirs/theta_e2e_v2_resume.log 2>&1
  echo "=== theta exit=$? ==="
  tail -8 work_dirs/theta_e2e_v2_resume.log
fi
bash tools/run_e2e_suite.sh dota_h_obb_r18_e2e dota_h_obb_robust_r18_e2e \
  dota_point_obb_r18_e2e dota_rroi_point_obb_r18_e2e \
  dota_retinanet_theta_obb_r18_e2e dota_centermap_net_r18_e2e
