#!/bin/bash
# Round-4 suite continuation: wait for the in-flight point_obb workflow
# (started under the original suite wrapper) to finish, then run the
# remaining configs in priority order (must-have rows first).
set -u
cd "$(dirname "$0")/.."
WAIT_PID=${1:?pid to wait for}
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
echo "=== point workflow done; resuming suite $(date) ==="
exec bash tools/run_e2e_suite.sh \
  dota_mask_obb_r18_e2e dota_h_obb_r18_e2e dota_h_obb_robust_r18_e2e \
  dota_centermap_net_r18_e2e dota_rroi_point_obb_r18_e2e \
  dota_retinanet_theta_obb_r18_e2e
