#!/bin/bash
# Round-5 chain rev d: scaled-proxy runs (VERDICT #8) queued after
# chain_r5c. Waits for r5c's done marker, then 2x-schedule mask-obb and
# (time permitting) point-obb: train + test + eval each. Deadline-guarded
# against the round's hard end so the driver's bench isn't starved.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
OUT=${OUT:-/tmp/perf_r5}
mkdir -p "$OUT" work_dirs
GT=data/dota_e2e_xl/val_patches_scene_gt_obb.json
# hard end of usable chip time this round (UTC epoch); default 08:40Z
HARD_END=${HARD_END:-$(date -d "2026-08-21 08:40" +%s)}

left() { echo $(( HARD_END - $(date +%s) )); }

echo "=== waiting for chain_r5c done marker ==="
while ! grep -q "chain_r5c done" /tmp/chain_r5c.out 2>/dev/null; do
  if [ -f /tmp/r5_stop ]; then echo "=== STOP flag ==="; exit 0; fi
  sleep 60
done
echo "=== r5c finished $(date); waiting for go-flag (30 min grace) ==="
# builder gets a 30-min window to claim the chip for profile-driven
# iteration (touch /tmp/r5d_hold to extend indefinitely, /tmp/r5d_go to
# start now); dead-man fallback keeps the chip busy if the builder is
# stuck elsewhere
GRACE_END=$(( $(date +%s) + 1800 ))
while [ ! -f /tmp/r5d_go ]; do
  if [ -f /tmp/r5_stop ]; then echo "=== STOP flag ==="; exit 0; fi
  if [ "$(date +%s)" -ge "$GRACE_END" ] && [ ! -f /tmp/r5d_hold ]; then
    echo "=== grace expired, auto-starting ==="; break
  fi
  sleep 30
done
echo "=== r5d starting, $(left)s of budget left $(date) ==="

# the 12-epoch centermap run was OOM-killed at 130 GB host RSS (leaked
# batch staging); 24-epoch runs WILL die mid-train without mitigation.
# malloc_trim now runs every log interval, arenas are capped, and each
# train gets up to 3 attempts resuming from the latest epoch ckpt.
export MALLOC_ARENA_MAX=2

run_2x() {
  local cfg=$1 name=$2 need_train=$3 need_teval=$4
  if [ "$(left)" -lt "$need_train" ]; then
    echo "=== SKIP $name train (need ${need_train}s, have $(left)s) ==="
    return 1
  fi
  echo "=== $name train $(date) ==="
  local rc=1
  for attempt in 1 2 3; do
    local resume=""
    if [ -d "work_dirs/${cfg%.py}/ckpt" ] && [ "$attempt" -gt 1 ]; then
      resume="--resume-from work_dirs/${cfg%.py}/ckpt"
    fi
    timeout $(( need_train )) python tools/train.py "configs/$cfg" \
      --work-dir "work_dirs/${cfg%.py}" $resume \
      >> "work_dirs/${cfg%.py}_r5.log" 2>&1
    rc=$?
    echo "=== $name train attempt $attempt exit=$rc $(date) ==="
    [ "$rc" -eq 0 ] && break
    if [ "$(left)" -lt "$need_teval" ]; then break; fi
  done
  if [ "$(left)" -lt "$need_teval" ]; then
    echo "=== SKIP $name test+eval (have $(left)s) ==="
    return 1
  fi
  echo "=== $name test+eval $(date) ==="
  timeout $(( need_teval )) python tools/dota_workflow.py "configs/$cfg" \
    --stages test eval --gt-json "$GT" \
    >> "work_dirs/${cfg%.py}_r5.log" 2>&1
  echo "=== $name test+eval exit=$? $(date) ==="
  grep -h "mAP" "work_dirs/${cfg%.py}_r5.log" | tail -4
}

run_2x dota_mask_obb_r18_e2e_2x.py mask2x 10000 2400
run_2x dota_point_obb_r18_e2e_2x.py point2x 9000 2400

echo "=== chain_r5d done $(date) ==="
