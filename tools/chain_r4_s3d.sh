#!/bin/bash
# Round-4 session-3 chain, rev d: tunnel-outage recovery (the axon
# tunnel hung mid-epoch-7 of the mask-obb row at 00:50 — device call
# never returned, so the transient-retry wrapper never saw an
# exception; rev-c chain would have burned hours of timeouts against
# the dead tunnel).  Probe until healthy, then run the remaining work
# in decision-value order with per-step start-deadline guards:
#   1. mask-obb resume from its epoch-6 ckpt + test + eval  (table row)
#   2. bench band baseline   (warms the exact BENCH_r04 program)
#   3. bench bandx           (the >=160 p/s shot)
#   4. h-robust row          (the VERDICT A/B delta)       [start <0330]
#   5. on-chip train profile (VERDICT item 3)              [start <0430]
#   6. fused re-measure, win-or-delete (VERDICT item 6)    [start <0500]
#   7. roi kernel standalone A/B                           [start <0510]
#   8. theta seed-2 (warm programs, noise bound)           [start <0505]
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
GT=data/dota_e2e_xl/val_patches_scene_gt_obb.json
OUT=${OUT:-/tmp/perf_r4b}
mkdir -p "$OUT"

probe() {
  timeout 90 python - >/dev/null 2>&1 <<'PY'
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float((x @ x).sum()) == 128.0 ** 3
PY
}
echo "=== probing tunnel $(date) ===" | tee -a /tmp/tunnel_watch4.log
until probe; do
  echo "tunnel down $(date)" >> /tmp/tunnel_watch4.log
  if [ -f /tmp/suite_stop4 ]; then echo "=== STOP flag ==="; exit 0; fi
  sleep 120
done
echo "=== tunnel healthy $(date) ===" | tee -a /tmp/tunnel_watch4.log

before() { [ "$(date +%H%M)" -lt "$1" ]; }
step() { echo "=== $1 ($(date +%H:%M:%S)) ==="; }

step "mask-obb resume from epoch-6 ckpt"
timeout 2400 python tools/train.py configs/dota_mask_obb_r18_e2e.py \
  --work-dir work_dirs/dota_mask_obb_r18_e2e \
  --resume-from work_dirs/dota_mask_obb_r18_e2e/ckpt \
  >>work_dirs/dota_mask_obb_r18_e2e_e2e.log 2>&1
echo "=== mask-obb resume exit=$? ==="
step "mask-obb test+eval"
timeout 3600 python tools/dota_workflow.py configs/dota_mask_obb_r18_e2e.py \
  --stages test eval --gt-json "$GT" \
  >>work_dirs/dota_mask_obb_r18_e2e_e2e.log 2>&1
echo "=== mask-obb test+eval exit=$? ==="
grep -h "mAP" work_dirs/dota_mask_obb_r18_e2e_e2e.log | tail -4

step "bench: band baseline (default flags — the BENCH_r04 program)"
AIDET_BENCH_SKIP_TRAIN=1 AIDET_ROI_BAND=1 timeout 2700 python bench.py \
  >"$OUT/bench_band.log" 2>&1
tail -2 "$OUT/bench_band.log"

step "bench: bandx"
AIDET_BENCH_SKIP_TRAIN=1 AIDET_ROI_BAND=x timeout 2700 python bench.py \
  >"$OUT/bench_bandx.log" 2>&1
tail -2 "$OUT/bench_bandx.log"

if before 0330 && [ ! -f /tmp/suite_stop4 ]; then
  step "h-robust precompile train"
  timeout 2700 python tools/train.py configs/dota_h_obb_robust_r18_e2e.py \
    --work-dir work_dirs/dota_h_obb_robust_r18_e2e --precompile \
    >work_dirs/dota_h_obb_robust_r18_e2e_precompile.log 2>&1
  echo "=== h-robust precompile exit=$? ==="
  step "h-robust workflow"
  timeout 4500 python tools/dota_workflow.py configs/dota_h_obb_robust_r18_e2e.py \
    --stages train test eval --gt-json "$GT" \
    >work_dirs/dota_h_obb_robust_r18_e2e_e2e.log 2>&1
  echo "=== h-robust exit=$? ==="
  grep -h "mAP" work_dirs/dota_h_obb_robust_r18_e2e_e2e.log | tail -4
else
  echo "=== h-robust SKIPPED (deadline) ==="
fi

if before 0430 && [ ! -f /tmp/suite_stop4 ]; then
  step "train-step profile (stages)"
  timeout 2700 python tools/profile_train.py --stages \
    >"$OUT/train_stages.log" 2>&1
  tail -16 "$OUT/train_stages.log"
fi

if before 0500 && [ ! -f /tmp/suite_stop4 ]; then
  step "fused strip kernels re-measure: win or delete"
  timeout 1500 python tools/bench_kernels_r3.py --only fused \
    >"$OUT/fused.log" 2>&1
  tail -8 "$OUT/fused.log"
fi

if before 0505 && [ ! -f /tmp/suite_stop4 ]; then
  step "theta seed-2 (warm programs)"
  timeout 3600 python tools/dota_workflow.py configs/dota_theta_obb_r18_e2e.py \
    --stages train test eval --gt-json "$GT" --seed 2 \
    --work-dir work_dirs/dota_theta_obb_r18_e2e_seed2 \
    >work_dirs/dota_theta_obb_r18_e2e_seed2.log 2>&1
  echo "=== theta seed-2 exit=$? ==="
  grep -h "mAP" work_dirs/dota_theta_obb_r18_e2e_seed2.log | tail -4
fi

if before 0510 && [ ! -f /tmp/suite_stop4 ]; then
  step "roi kernel family A/B (band vs bandx @16k rois)"
  timeout 1500 python tools/bench_kernels_r3.py --only roi \
    >"$OUT/roi_kernels.log" 2>&1
  tail -12 "$OUT/roi_kernels.log"
fi

echo "=== chain rev-d done $(date) ==="
