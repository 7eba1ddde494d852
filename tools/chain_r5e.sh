#!/bin/bash
# Round-5 hold-window chain (runs while chain_r5d waits on /tmp/r5d_hold):
#   1. centermap: resume final epoch -> test at batch 4 (the batch-8
#      predict program needs 20.2 G HBM; _fuse_semantic roi gather) -> eval
#   2. ROI band A/B: bench primary metric with the band kernel to
#      attribute the 143.7 -> 131.7 regression (bandx default vs riou SoA)
#   3. bisect fwd probe: fwd_rpn vs fwd locates the in-context cost of
#      the no-grad rcnn forward chain (fwd=181.6 ms is the step's bulk)
# Releases chain_r5d on exit.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
export MALLOC_ARENA_MAX=2
OUT=${OUT:-/tmp/perf_r5}
mkdir -p "$OUT" work_dirs
GT=data/dota_e2e_xl/val_patches_scene_gt_obb.json

probe() {
  timeout 240 python - >/dev/null 2>&1 <<'PY'
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float((x @ x).sum()) == 128.0 ** 3
PY
}
until probe; do echo "tunnel down $(date)"; sleep 120; done
echo "=== tunnel healthy $(date) ==="

echo "=== centermap resume final epoch $(date) ==="
timeout 2400 python tools/train.py configs/dota_centermap_net_r18_e2e.py \
  --work-dir work_dirs/dota_centermap_net_r18_e2e \
  --resume-from work_dirs/dota_centermap_net_r18_e2e/ckpt \
  >> work_dirs/dota_centermap_net_r18_e2e_r5_e2e.log 2>&1
echo "=== resume exit=$? $(date) ==="

echo "=== centermap test(b4)+eval $(date) ==="
timeout 4200 python tools/dota_workflow.py configs/dota_centermap_net_r18_e2e.py \
  --stages test eval --gt-json "$GT" --batch-size 4 \
  >> work_dirs/dota_centermap_net_r18_e2e_r5_e2e.log 2>&1
echo "=== test+eval exit=$? $(date) ==="
grep -h "mAP" work_dirs/dota_centermap_net_r18_e2e_r5_e2e.log | tail -4

echo "=== bench A/B: ROI band (old default) $(date) ==="
AIDET_ROI_BAND=band AIDET_BENCH_SKIP_TRAIN=1 timeout 2700 python bench.py \
  > "$OUT/bench_band.log" 2>&1
tail -2 "$OUT/bench_band.log"

echo "=== bisect fwd probe $(date) ==="
timeout 2700 python tools/bisect_train.py --variants fwd_rpn,fwd --iters 6 \
  > "$OUT/bisect_fwd.log" 2>&1
tail -4 "$OUT/bisect_fwd.log"

echo "=== releasing chain_r5d $(date) ==="
touch /tmp/r5d_go
rm -f /tmp/r5d_hold
echo "=== chain_r5e done $(date) ==="
