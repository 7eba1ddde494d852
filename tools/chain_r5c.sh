#!/bin/bash
# Round-5 chain rev c: fresh-machine restart (work_dirs + jax cache wiped,
# the epoch-8 centermap ckpt is gone). Serial chip queue:
#   1. centermap train FROM SCRATCH + test + eval  (VERDICT #2)
#   2. full bench (bandx default, scene breakdown, train metric)
#   3. train profile: loss/grad/step split + substages w/ rpn breakdown
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
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
echo "=== probing tunnel $(date) ==="
until probe; do
  echo "tunnel down $(date)"
  if [ -f /tmp/r5_stop ]; then echo "=== STOP flag ==="; exit 0; fi
  sleep 120
done
echo "=== tunnel healthy $(date) ==="

echo "=== centermap train from scratch $(date) ==="
timeout 9000 python tools/train.py configs/dota_centermap_net_r18_e2e.py \
  --work-dir work_dirs/dota_centermap_net_r18_e2e \
  >> work_dirs/dota_centermap_net_r18_e2e_r5_e2e.log 2>&1
echo "=== centermap train exit=$? $(date) ==="

echo "=== centermap test+eval $(date) ==="
timeout 4500 python tools/dota_workflow.py configs/dota_centermap_net_r18_e2e.py \
  --stages test eval --gt-json "$GT" \
  >> work_dirs/dota_centermap_net_r18_e2e_r5_e2e.log 2>&1
echo "=== centermap test+eval exit=$? $(date) ==="
grep -h "mAP" work_dirs/dota_centermap_net_r18_e2e_r5_e2e.log | tail -4

echo "=== bench: full (bandx default) $(date) ==="
timeout 4500 python bench.py > "$OUT/bench_full.log" 2>&1
tail -3 "$OUT/bench_full.log"

echo "=== profile: loss/grad/step split $(date) ==="
timeout 2700 python tools/profile_train.py --iters 6 > "$OUT/train_split.log" 2>&1
tail -6 "$OUT/train_split.log"

echo "=== profile: substages (incl. rpn breakdown) $(date) ==="
timeout 2700 python tools/profile_train.py --stages --iters 6 > "$OUT/train_stages.log" 2>&1
tail -18 "$OUT/train_stages.log"

echo "=== chain_r5c done $(date) ==="
