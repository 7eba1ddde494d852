# (parity: reference configs/cascade_mask_rcnn_r101_fpn_1x.py)
_base_ = "cascade_mask_rcnn_r50_fpn_1x.py"
model = dict(backbone=dict(depth=101))
