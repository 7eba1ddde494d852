#!/bin/bash
# Round-4 session-2 chip perf session (serial with training — tunnel
# executor starves under concurrent compiles).  Decision-value order:
# a deadline cut still yields (1) the band-vs-bandx verdict, (2) the
# batch-size verdict, (3) the final default-flag bench that warms the
# exact program the driver's BENCH_r04 run will hit, (4) the on-chip
# train profile, (5) fused win-or-delete.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
OUT=${OUT:-/tmp/perf_r4b}
mkdir -p "$OUT"
step() { echo "=== $1 ($(date +%H:%M:%S)) ==="; }

step "bench: band baseline (inference only, new rpn default)"
AIDET_BENCH_SKIP_TRAIN=1 AIDET_ROI_BAND=1 timeout 2700 python bench.py \
  >"$OUT/bench_band.log" 2>&1
tail -2 "$OUT/bench_band.log"

step "bench: bandx"
AIDET_BENCH_SKIP_TRAIN=1 AIDET_ROI_BAND=x timeout 2700 python bench.py \
  >"$OUT/bench_bandx.log" 2>&1
tail -2 "$OUT/bench_bandx.log"

# pick the roi winner by the primary metric
BAND=$(python - "$OUT" <<'PY'
import json, sys, os
out = sys.argv[1]
def val(p):
    try:
        for line in open(p):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)["value"]
    except Exception:
        pass
    return 0
print("x" if val(os.path.join(out, "bench_bandx.log"))
      > val(os.path.join(out, "bench_band.log")) else "1")
PY
)
echo "roi winner: AIDET_ROI_BAND=$BAND"

# mandatory deliverables first (VERDICT r3 items 3 and 6): the
# on-chip train profile and the fused win-or-delete measurement.
# The single-flag A/B controls are luxuries — each is a potentially
# cold ~30-min compile for one sentence of notes — so they run last
# and are the ones a deadline cut drops.
step "train-step profile (stages)"
timeout 2700 python tools/profile_train.py --stages \
  >"$OUT/train_stages.log" 2>&1
tail -16 "$OUT/train_stages.log"

step "fused strip kernels re-measure: win or delete"
timeout 1500 python tools/bench_kernels_r3.py --only fused \
  >"$OUT/fused.log" 2>&1
tail -8 "$OUT/fused.log"

step "roi kernel family A/B (band vs bandx @16k rois)"
timeout 1500 python tools/bench_kernels_r3.py --only roi \
  >"$OUT/roi_kernels.log" 2>&1
tail -12 "$OUT/roi_kernels.log"

step "bench: winner + batch 32"
AIDET_BENCH_SKIP_TRAIN=1 AIDET_ROI_BAND=$BAND AIDET_BENCH_BATCH=32 \
  timeout 1800 python bench.py >"$OUT/bench_b32.log" 2>&1
tail -2 "$OUT/bench_b32.log"

step "bench: rpn-combined OFF control (winner roi, batch 16)"
AIDET_BENCH_SKIP_TRAIN=1 AIDET_ROI_BAND=$BAND AIDET_RPN_COMBINED=0 \
  timeout 1800 python bench.py >"$OUT/bench_rpnsplit.log" 2>&1
tail -2 "$OUT/bench_rpnsplit.log"

step "bench: stem-phase OFF control (winner roi, batch 16)"
AIDET_BENCH_SKIP_TRAIN=1 AIDET_ROI_BAND=$BAND AIDET_STEM_PHASE=0 \
  timeout 1800 python bench.py >"$OUT/bench_stemoff.log" 2>&1
tail -2 "$OUT/bench_stemoff.log"

echo "=== perf session part-1 done $(date) ==="
