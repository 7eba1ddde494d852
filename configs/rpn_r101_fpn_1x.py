# (parity: reference configs/rpn_r101_fpn_1x.py)
_base_ = "rpn_r50_fpn_1x.py"
model = dict(backbone=dict(depth=101))
