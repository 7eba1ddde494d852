#!/bin/bash
# Round-4 session-5 chain, rev e: written while the axon tunnel is in
# its second outage of the night (down since ~00:50, still down 01:50).
# Replaces rev d, whose absolute deadlines (h-robust <0330 etc.) were
# set for an early recovery and would skip the two-round-slipped
# h-robust A/B row even with hours of session left.  All guards are
# now relative to a single HARD_END; ordering is decision-value:
#   1. mask-obb resume from epoch-6 ckpt + test + eval  (table row)
#   2. bench bandx        (the >=160 p/s shot; cold compile)
#   3. bench band control (warm program, the r03 number's flags)
#   4. h-robust row       (the VERDICT A/B delta, slipped 2 rounds)
#   5. full plain bench   (warms the exact driver program: scene+train)
#   6. on-chip train profile (VERDICT item 3)
#   7. fused re-measure, win-or-delete (VERDICT item 6)
#   8. roi kernel standalone A/B
#   9. stretch table rows: rroi-point / retinanet-theta / centermap-net
# theta seed-2 dropped: chain2 already recorded it as *_seed1
# (OBB 0.2940 / HBB 0.4280 vs seed-0 0.2798/0.4227 -> noise ~0.014).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
GT=data/dota_e2e_xl/val_patches_scene_gt_obb.json
OUT=${OUT:-/tmp/perf_r4e}
mkdir -p "$OUT"
HARD_END=${HARD_END:-$(date -d '06:10' +%s)}

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
  if [ "$(date +%s)" -ge "$HARD_END" ]; then
    echo "=== HARD_END reached while tunnel down ==="; exit 0
  fi
  sleep 120
done
echo "=== tunnel healthy $(date) ===" | tee -a /tmp/tunnel_watch4.log

left() { echo $(( HARD_END - $(date +%s) )); }
# need <secs> — start this step only if that much budget remains
need() { [ "$(left)" -ge "$1" ] && [ ! -f /tmp/suite_stop4 ]; }
step() { echo "=== $1 ($(date +%H:%M:%S), left $(left)s) ==="; }

if need 3300; then
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
fi

if need 2100; then
  step "bench: bandx (inference only — the >=160 shot)"
  AIDET_BENCH_SKIP_TRAIN=1 AIDET_ROI_BAND=x timeout 2700 python bench.py \
    >"$OUT/bench_bandx.log" 2>&1
  tail -2 "$OUT/bench_bandx.log"
fi

if need 1200; then
  step "bench: band control (default flags, warm program)"
  AIDET_BENCH_SKIP_TRAIN=1 AIDET_ROI_BAND=1 timeout 1800 python bench.py \
    >"$OUT/bench_band.log" 2>&1
  tail -2 "$OUT/bench_band.log"
fi

if need 4800; then
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
  echo "=== h-robust SKIPPED (budget) ==="
fi

if need 3000; then
  step "full plain bench (driver program: scene e2e + train metric)"
  timeout 3600 python bench.py >"$OUT/bench_final.log" 2>&1
  tail -2 "$OUT/bench_final.log"
fi

if need 2100; then
  step "train-step profile (stages)"
  timeout 2700 python tools/profile_train.py --stages \
    >"$OUT/train_stages.log" 2>&1
  tail -16 "$OUT/train_stages.log"
fi

if need 1500; then
  step "fused strip kernels re-measure: win or delete"
  timeout 1500 python tools/bench_kernels_r3.py --only fused \
    >"$OUT/fused.log" 2>&1
  tail -8 "$OUT/fused.log"
fi

if need 1200; then
  step "roi kernel family A/B (band vs bandx @16k rois)"
  timeout 1500 python tools/bench_kernels_r3.py --only roi \
    >"$OUT/roi_kernels.log" 2>&1
  tail -12 "$OUT/roi_kernels.log"
fi

for cfg in dota_rroi_point_obb_r18_e2e dota_retinanet_theta_obb_r18_e2e \
           dota_centermap_net_r18_e2e; do
  if need 5400; then
    step "stretch row: $cfg"
    timeout 5400 python tools/dota_workflow.py "configs/$cfg.py" \
      --stages train test eval --gt-json "$GT" \
      >"work_dirs/${cfg}_e2e.log" 2>&1
    echo "=== $cfg exit=$? ==="
    grep -h "mAP" "work_dirs/${cfg}_e2e.log" | tail -4
  else
    echo "=== stretch row $cfg SKIPPED (budget) ==="
  fi
done

echo "=== chain rev-e done $(date) ==="
