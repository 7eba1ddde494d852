# hobb e2e recipe + sort-robust regression loss: per-sample min over
# the 4 cyclic first-edge target representations (hobb_rolls), which
# removes the best-point-sort target cliff tools/analyze_hobb.py
# quantifies (1.0-1.4 normalized-unit jumps, one per 90 deg). A/B row
# against dota_h_obb_r18_e2e.py isolates the discontinuity's
# contribution to the hobb-vs-theta trained-quality gap.
_base_ = "dota_h_obb_r18_e2e.py"
model = dict(hobb_robust_loss=True)
