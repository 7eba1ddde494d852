"""Results (val scenes, synthetic devkit dota_e2e_xl, R18@512 GN 12ep from scratch):
    OBB mAP@0.5: 0.2355    HBB mAP@0.5: 0.4166
(recorded by tools/publish_results.py — the reference's
config-docstring convention, configs/dota/dota_v002_theta_obb_r50_v1_train.py:2-8)
"""
# hobb e2e recipe + sort-robust regression loss: per-sample min over
# the 4 cyclic first-edge target representations (hobb_rolls), which
# removes the best-point-sort target cliff tools/analyze_hobb.py
# quantifies (1.0-1.4 normalized-unit jumps, one per 90 deg). A/B row
# against dota_h_obb_r18_e2e.py isolates the discontinuity's
# contribution to the hobb-vs-theta trained-quality gap.
_base_ = "dota_h_obb_r18_e2e.py"
model = dict(hobb_robust_loss=True)
