#!/bin/bash
# Cross-city BuildChange generalization matrix (parity: reference
# tools/buildchange/per_city_buildchange_4.sh — for each per-city
# model, run inference + COCO bbox/segm eval against every city's val
# split).  Usage:
#   tools/per_city_buildchange.sh <train:0|1> <test:0|1> [models...]
# Stage flags mirror the reference's $1/$2 convention (0 = skip).
set -u
cd "$(dirname "$0")/.."

TRAIN=${1:-0}
TEST=${2:-1}
shift 2 2>/dev/null || true
MODELS=${*:-buildchange_mask_rcnn_r50_shanghai \
  buildchange_mask_rcnn_r50_beijing buildchange_mask_rcnn_r50_haerbin}
CITIES="jinan chengdu beijing shanghai haerbin"

for model in $MODELS; do
  if [ "$TRAIN" == 1 ]; then
    echo "==== train $model ===="
    python tools/train.py "configs/$model.py" \
      --work-dir "work_dirs/$model" || exit 1
  fi
  if [ "$TEST" == 1 ]; then
    for city in $CITIES; do
      echo "==== evaluate $model on $city ===="
      mkdir -p "results/buildchange/$model"
      out="results/buildchange/$model/${model}_${city}.pkl"
      # retarget the test split at $city before inference: write a
      # tiny delta config (the eval CLI re-applies the same swap)
      tmp=$(mktemp --suffix .py)
      cat > "$tmp" <<EOF
_base_ = "$(pwd)/configs/$model.py"
city = "$city"
data = dict(test=dict(
    ann_file="data/buildchange/annotations/val_${city}.json",
    img_prefix="data/buildchange/${city}/images"))
EOF
      python tools/test.py "$tmp" \
        --checkpoint "work_dirs/$model/ckpt" --out "$out" --eval \
        && python tools/buildchange_eval.py "$tmp" "$out" \
          --jsonfile-prefix "results/buildchange/$model/${model}_${city}"
      rm -f "$tmp"
    done
  fi
done
