# RepPoints moment transform — the headline method (parity: reference
# configs/reppoints/reppoints_moment_r50_fpn_1x.py)
_base_ = "reppoints_minmax_r50_fpn_1x.py"
model = dict(transform_method="moment")
