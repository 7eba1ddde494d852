#!/bin/bash
# Round-4 session-3 chain, rev c: compile-time reality forced a trim —
# cold predict compiles measure 25-35 min over the tunnel, so per-row
# train-scene (capacity) evals are dropped and the deadline moves to
# 0200.  Order: h_obb val test+eval retry (checkpoint exists; its test
# program cache-warms h_robust's too), mask-obb row, h-robust row,
# then the chip perf session (its first step warms the exact program
# the driver's BENCH_r04 run hits).
set -u
cd "$(dirname "$0")/.."
WAIT_PID=${1:?pid to wait for}
DEADLINE=${DEADLINE:-0200}
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
rm -f /tmp/suite_stop2
echo "=== prior suite drained $(date) ==="
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
GT=data/dota_e2e_xl/val_patches_scene_gt_obb.json

echo "=== h_obb val test+eval retry ($(date +%H:%M)) ==="
timeout 3600 python tools/dota_workflow.py configs/dota_h_obb_r18_e2e.py \
  --stages test eval --gt-json "$GT" \
  >work_dirs/dota_h_obb_r18_e2e_testeval.log 2>&1
echo "=== h_obb test+eval exit=$? ==="
grep -h "mAP" work_dirs/dota_h_obb_r18_e2e_testeval.log | tail -4

for name in dota_mask_obb_r18_e2e dota_h_obb_robust_r18_e2e \
    dota_centermap_net_r18_e2e dota_rroi_point_obb_r18_e2e \
    dota_retinanet_theta_obb_r18_e2e; do
  if [ -f /tmp/suite_stop3 ]; then echo "=== STOP flag ==="; break; fi
  now=$(date +%H%M)
  if [ "$now" -ge "$DEADLINE" ] && [ "$now" -lt 2000 ]; then
    echo "=== $name SKIPPED (deadline $DEADLINE, now $now) ==="
    continue
  fi
  echo "=== $name precompile train+test ($(date +%H:%M)) ==="
  timeout 2700 python tools/train.py "configs/$name.py" \
    --work-dir "work_dirs/$name" --precompile \
    >"work_dirs/${name}_precompile.log" 2>&1
  echo "=== train precompile exit=$? ==="
  timeout 2700 python tools/test.py "configs/$name.py" --precompile \
    >>"work_dirs/${name}_precompile.log" 2>&1
  echo "=== test precompile exit=$? ==="
  echo "=== $name workflow ($(date +%H:%M)) ==="
  timeout 4500 python tools/dota_workflow.py "configs/$name.py" \
    --stages train test eval --gt-json "$GT" \
    >"work_dirs/${name}_e2e.log" 2>&1
  echo "=== $name exit=$? ==="
  grep -h "mAP" "work_dirs/${name}_e2e.log" | tail -4
done
echo "=== priority queue done; perf session $(date) ==="
bash tools/perf_session_r4b.sh > work_dirs/perf_r4b.log 2>&1
echo "=== chain done $(date) ==="
