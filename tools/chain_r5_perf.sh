#!/bin/bash
# Round-5 perf chain: waits for the centermap workflow to finish, then
# runs the bench + profile queue serially on the chip.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
OUT=${OUT:-/tmp/perf_r5}
mkdir -p "$OUT"

# wait for the centermap dota_workflow process to exit (poll by pidfile-
# free check: any python running that config's workflow)
while pgrep -f "dota_workflow.py configs/dota_centermap_net_r18_e2e" > /dev/null 2>&1; do
  sleep 60
done
echo "=== centermap workflow done, starting perf queue $(date) ==="

echo "=== bench: full (bandx default now) ==="
timeout 3600 python bench.py > "$OUT/bench_full.log" 2>&1
tail -3 "$OUT/bench_full.log"

echo "=== profile: loss/grad/step split ==="
timeout 2700 python tools/profile_train.py --iters 6 > "$OUT/train_split.log" 2>&1
tail -6 "$OUT/train_split.log"

echo "=== profile: substages (incl. rpn breakdown) ==="
timeout 2700 python tools/profile_train.py --stages --iters 6 > "$OUT/train_stages.log" 2>&1
tail -16 "$OUT/train_stages.log"

echo "=== chain_r5_perf done $(date) ==="
