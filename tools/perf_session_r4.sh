#!/bin/bash
# Round-4 chip perf session (run AFTER the e2e suite; single-tenant
# chip — NEVER overlap with training: remote compiles starve the
# tunnel executor, observed 18:33 this round).  Ordered by decision
# value so a deadline cut still yields the bandx verdict first.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
OUT=/tmp/perf_r4
mkdir -p "$OUT"

step() { echo "=== $1 ($(date +%H:%M:%S)) ==="; }

step "bench: band baseline (inference only)"
AIDET_BENCH_SKIP_TRAIN=1 AIDET_ROI_BAND=1 timeout 1800 python bench.py \
  >"$OUT/bench_band.log" 2>&1
tail -2 "$OUT/bench_band.log"

step "bench: bandx (inference only)"
AIDET_BENCH_SKIP_TRAIN=1 AIDET_ROI_BAND=x timeout 1800 python bench.py \
  >"$OUT/bench_bandx.log" 2>&1
tail -2 "$OUT/bench_bandx.log"

step "bench: bandx + stem-phase"
AIDET_BENCH_SKIP_TRAIN=1 AIDET_ROI_BAND=x AIDET_STEM_PHASE=1 \
  timeout 1800 python bench.py >"$OUT/bench_bandx_phase.log" 2>&1
tail -2 "$OUT/bench_bandx_phase.log"

step "full bench (scene e2e + train metric; long cold compiles)"
timeout 3600 python bench.py >"$OUT/bench_final.log" 2>&1
tail -2 "$OUT/bench_final.log"

step "train-step profile (stages)"
timeout 3600 python tools/profile_train.py --stages \
  >"$OUT/train_stages.log" 2>&1
tail -14 "$OUT/train_stages.log"

step "roi kernel family A/B (band vs bandx @16k rois)"
timeout 1800 python tools/bench_kernels_r3.py --only roi \
  >"$OUT/roi_kernels.log" 2>&1
tail -20 "$OUT/roi_kernels.log"

step "fused strip kernels re-measure: win or delete"
timeout 1800 python tools/bench_kernels_r3.py --only fused \
  >"$OUT/fused.log" 2>&1
tail -8 "$OUT/fused.log"
