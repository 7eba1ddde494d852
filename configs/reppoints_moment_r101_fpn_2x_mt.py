# (parity: reference configs/reppoints/reppoints_moment_r101_fpn_2x_mt.py)
_base_ = "reppoints_moment_r50_fpn_2x_mt.py"
model = dict(backbone=dict(depth=101))
