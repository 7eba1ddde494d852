#!/bin/bash
# Round-4 session-3 chain part 2: after the priority queue + perf
# session drain, run a SECOND SEED of the theta row (VERDICT round-3
# item 4: show per-encoding deltas exceed run-to-run noise) if the
# session still has headroom.
set -u
cd "$(dirname "$0")/.."
WAIT_PID=${1:?pid to wait for}
CUTOFF=${CUTOFF:-0245}   # HHMM; skip if starting later
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
now=$(date +%H%M)
if [ -f /tmp/suite_stop3 ]; then echo "=== STOP flag; no seed row ==="; exit 0; fi
if [ "$now" -ge "$CUTOFF" ] && [ "$now" -lt 2000 ]; then
  echo "=== theta seed-1 SKIPPED (cutoff $CUTOFF, now $now) ==="
  exit 0
fi
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
GT=data/dota_e2e_xl/val_patches_scene_gt_obb.json
name=dota_theta_obb_r18_e2e
echo "=== $name seed-1 workflow ($(date +%H:%M)) ==="
timeout 4500 python tools/dota_workflow.py "configs/$name.py" \
  --work-dir "work_dirs/${name}_seed1" --seed 1 \
  --stages train test eval --gt-json "$GT" \
  >"work_dirs/${name}_seed1_e2e.log" 2>&1
echo "=== seed-1 exit=$? ==="
grep -h "mAP" "work_dirs/${name}_seed1_e2e.log" | tail -4
