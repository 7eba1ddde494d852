# (parity: reference configs/gn/mask_rcnn_r101_fpn_gn_2x.py)
_base_ = "mask_rcnn_r50_fpn_gn_2x.py"
model = dict(backbone=dict(depth=101))
