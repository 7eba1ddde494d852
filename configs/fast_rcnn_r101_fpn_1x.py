# (parity: reference configs/fast_rcnn_r101_fpn_1x.py)
_base_ = "fast_rcnn_r50_fpn_1x.py"
model = dict(backbone=dict(depth=101))
