#!/bin/bash
# Round-5 end-window chain: runs after chain_r5d (mask2x) finishes.
#   1. publish the clean mask2x row
#   2. predict-path stage profile (settles whether the riou rnms is the
#      134-vs-143.7 regression or it's tunnel-day variance)
#   3. AIDET_ASSIGN_BF16=1 train-step A/B
#   4. final bench with committed defaults (also warms the driver cache)
# Deadline-guarded against HARD_END so the driver's own bench isn't
# starved.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
export MALLOC_ARENA_MAX=2
OUT=${OUT:-/tmp/perf_r5}
mkdir -p "$OUT"
HARD_END=${HARD_END:-$(date -d "2026-08-21 08:40" +%s)}
left() { echo $(( HARD_END - $(date +%s) )); }

while ! grep -q "chain_r5d done" /tmp/chain_r5d.out 2>/dev/null; do
  if [ -f /tmp/r5_stop ]; then echo "=== STOP flag ==="; exit 0; fi
  sleep 60
done
echo "=== r5d done; $(left)s left $(date) ==="

python tools/publish_results.py 2>&1 | tail -3

if [ "$(left)" -gt 2000 ]; then
  echo "=== profile_predict $(date) ==="
  timeout 1800 python tools/profile_predict.py --iters 6 \
    > "$OUT/predict_stages.log" 2>&1
  tail -14 "$OUT/predict_stages.log"
fi

if [ "$(left)" -gt 1800 ]; then
  echo "=== bf16-assign train A/B $(date) ==="
  AIDET_ASSIGN_BF16=1 timeout 1700 python tools/profile_train.py --iters 6 \
    > "$OUT/train_bf16.log" 2>&1
  tail -5 "$OUT/train_bf16.log"
fi

if [ "$(left)" -gt 1200 ]; then
  echo "=== final bench $(date) ==="
  AIDET_BENCH_SKIP_TRAIN=1 timeout 1100 python bench.py \
    > "$OUT/bench_final.log" 2>&1
  tail -2 "$OUT/bench_final.log"
fi
echo "=== chain_r5g done $(date) ==="
