# Partial min-max: box from the first 4 points (parity: reference
# configs/reppoints/reppoints_partial_minmax_r50_fpn_1x.py)
_base_ = "reppoints_minmax_r50_fpn_1x.py"
model = dict(transform_method="partial_minmax")
