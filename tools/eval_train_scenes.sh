#!/bin/bash
# Train-scene (capacity-protocol) evals for the round-3 e2e suite.
#
# The suite's val-scene rows measure generalization of a from-scratch
# R18 on 432 synthetic patches — too noisy an instrument for the
# per-encoding codec comparison (round 2's per-encoding table was
# eval-on-train-scenes, the protocol the verify recipe documents as
# "OBB mAP ~= 0.8 on the training scenes"). This script re-tests each
# trained checkpoint on the TRAIN patches and evaluates against the
# train-scene gt, writing into work_dirs/<name>_trainscene so the
# val-scene artifacts are preserved. Run when the chip is free.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
GT=${GT:-data/dota_e2e_xl/train_patches_scene_gt_obb.json}
TSC=/tmp/ts_cfgs
mkdir -p "$TSC"

CFGS=${*:-dota_theta_obb_r18_e2e dota_h_obb_r18_e2e \
  dota_h_obb_robust_r18_e2e dota_point_obb_r18_e2e \
  dota_rroi_point_obb_r18_e2e dota_retinanet_theta_obb_r18_e2e \
  dota_centermap_net_r18_e2e dota_mask_obb_r18_e2e}

for name in $CFGS; do
  ckpt="work_dirs/$name/ckpt"
  if [ ! -d "$ckpt" ]; then
    echo "=== $name SKIP (no checkpoint) ==="
    continue
  fi
  echo "=== $name (train-scene eval) ==="
  wd="work_dirs/${name}_trainscene"
  mkdir -p "$wd"
  # reuse the trained checkpoint; keep val artifacts untouched
  rm -rf "$wd/ckpt" && cp -r "$ckpt" "$wd/ckpt"
  cat > "$TSC/$name.py" <<EOF
_base_ = "/root/repo/configs/$name.py"
data = dict(test=dict(ann_file="data/dota_e2e_xl/train_patches.json",
                      img_prefix="data/dota_e2e_xl/train_patches"))
EOF
  timeout 2400 python tools/dota_workflow.py "$TSC/$name.py" \
    --work-dir "$wd" --stages test eval --gt-json "$GT" \
    >"work_dirs/${name}_trainscene_eval.log" 2>&1
  echo "=== $name exit=$? ==="
  grep -h "mAP:" "work_dirs/${name}_trainscene_eval.log" | tail -2
done
