#!/bin/bash
# Round-4 session-3 chain: wait for the in-flight suite (h_obb row) to
# drain, then run the remaining table rows in *priority* order — the
# mask-obb retry (row lost to a tunnel drop, retry logic now in
# apis/train.py) and the h-robust A/B are VERDICT round-3 "done"
# criteria; centermap/rroi/retinanet are breadth.  Rows starting after
# DEADLINE are skipped so the chip perf session (bench >= 160 p/s ask)
# gets the final stretch.
set -u
cd "$(dirname "$0")/.."
WAIT_PID=${1:?pid to wait for}
DEADLINE=${DEADLINE:-0130}   # HHMM; rows starting later are skipped
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
rm -f /tmp/suite_stop2
echo "=== prior suite drained; priority queue starting $(date) ==="
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
GT=data/dota_e2e_xl/val_patches_scene_gt_obb.json
for name in dota_mask_obb_r18_e2e dota_h_obb_robust_r18_e2e \
    dota_centermap_net_r18_e2e dota_rroi_point_obb_r18_e2e \
    dota_retinanet_theta_obb_r18_e2e; do
  if [ -f /tmp/suite_stop3 ]; then echo "=== STOP flag ==="; break; fi
  now=$(date +%H%M)
  # deadline window: skip only when now is in [DEADLINE, 2000) for a
  # small-hours deadline (avoid 2330 > 0130 false trigger)
  if [ "$now" -ge "$DEADLINE" ] && [ "$now" -lt 2000 ]; then
    echo "=== $name SKIPPED (deadline $DEADLINE, now $now) ==="
    continue
  fi
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
echo "=== priority queue done; perf session $(date) ==="
bash tools/perf_session_r4b.sh > work_dirs/perf_r4b.log 2>&1
echo "=== chain done $(date) ==="
