#!/bin/bash
# Round-3 e2e suite (rerun after the tunnel outage + devkit
# regeneration): all encodings train fresh on the fixed-bounds devkit
# so the per-encoding comparison is apples-to-apples. ~35 min/config
# on the v5e chip (25 epochs, batch 2, R18@512).
set -u
cd "$(dirname "$0")/.."
bash tools/run_e2e_suite.sh dota_theta_obb_r18_e2e dota_h_obb_r18_e2e \
  dota_h_obb_robust_r18_e2e dota_point_obb_r18_e2e \
  dota_rroi_point_obb_r18_e2e dota_retinanet_theta_obb_r18_e2e \
  dota_centermap_net_r18_e2e
