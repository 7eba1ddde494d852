#!/bin/bash
# Round-4 suite continuation: wait for the in-flight point_obb workflow
# to finish, run the remaining configs in priority order (must-have
# rows first), skip whatever would start after the deadline (the chip
# perf session needs the last hour of the round), then hand the chip
# to tools/perf_session_r4.sh.
set -u
cd "$(dirname "$0")/.."
WAIT_PID=${1:?pid to wait for}
DEADLINE=${DEADLINE:-2215}   # HHMM local; configs starting later are skipped
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
echo "=== point workflow done; resuming suite $(date) ==="
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
GT=data/dota_e2e_xl/val_patches_scene_gt_obb.json
for name in dota_mask_obb_r18_e2e dota_h_obb_r18_e2e \
    dota_h_obb_robust_r18_e2e dota_centermap_net_r18_e2e \
    dota_rroi_point_obb_r18_e2e dota_retinanet_theta_obb_r18_e2e; do
  now=$(date +%H%M)
  if [ "$now" -ge "$DEADLINE" ]; then
    echo "=== $name SKIPPED (deadline $DEADLINE, now $now) ==="
    continue
  fi
  echo "=== $name ($(date +%H:%M)) ==="
  timeout 4500 python tools/dota_workflow.py "configs/$name.py" \
    --stages train test eval --gt-json "$GT" \
    >"work_dirs/${name}_e2e.log" 2>&1
  echo "=== $name exit=$? ==="
  tail -5 "work_dirs/${name}_e2e.log"
done
echo "=== suite done; starting perf session $(date) ==="
bash tools/perf_session_r4.sh > work_dirs/perf_r4.log 2>&1
echo "=== perf session done $(date) ==="
