#!/bin/bash
# Round-3 chip perf session (run AFTER the e2e suite; single-tenant chip).
# Produces /tmp/perf_r3/: kernel A/Bs, stem A/B, bench A/Bs, train profile.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
OUT=/tmp/perf_r3
mkdir -p "$OUT"

step() { echo "=== $1 ==="; }

step "roi kernel family A/B (band vs bandx @16k rois)"
timeout 1800 python tools/bench_kernels_r3.py --only roi \
  >"$OUT/roi_kernels.log" 2>&1
tail -20 "$OUT/roi_kernels.log"

step "fused strip kernels re-measure (restructured chunked-2D form)"
timeout 1800 python tools/bench_kernels_r3.py --only fused \
  >"$OUT/fused.log" 2>&1
tail -8 "$OUT/fused.log"

step "stem A/B (s2d vs phase-decomposed, full backbone)"
timeout 1800 python tools/bench_kernels_r3.py --only stem \
  >"$OUT/stem.log" 2>&1
tail -4 "$OUT/stem.log"

step "bench baseline (band, stem-phase OFF)"
AIDET_ROI_BAND=1 AIDET_STEM_PHASE=0 timeout 1800 python bench.py \
  >"$OUT/bench_band_nophase.log" 2>&1
tail -2 "$OUT/bench_band_nophase.log"

step "bench bandx only"
AIDET_ROI_BAND=x AIDET_STEM_PHASE=0 timeout 1800 python bench.py \
  >"$OUT/bench_bandx_nophase.log" 2>&1
tail -2 "$OUT/bench_bandx_nophase.log"

step "bench stem-phase only"
AIDET_ROI_BAND=1 AIDET_STEM_PHASE=1 timeout 1800 python bench.py \
  >"$OUT/bench_band_phase.log" 2>&1
tail -2 "$OUT/bench_band_phase.log"

step "bench bandx + stem-phase"
AIDET_ROI_BAND=x AIDET_STEM_PHASE=1 timeout 1800 python bench.py \
  >"$OUT/bench_bandx_phase.log" 2>&1
tail -2 "$OUT/bench_bandx_phase.log"

step "train-step profile (full + substages)"
timeout 2400 python tools/profile_train.py >"$OUT/train_full.log" 2>&1
tail -4 "$OUT/train_full.log"
timeout 3600 python tools/profile_train.py --stages \
  >"$OUT/train_stages.log" 2>&1
tail -12 "$OUT/train_stages.log"
