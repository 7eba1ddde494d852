# (parity: reference configs/cascade_mask_rcnn_x101_64x4d_fpn_1x.py)
_base_ = "cascade_mask_rcnn_r50_fpn_1x.py"
model = dict(backbone=dict(type="ResNeXt", depth=101, groups=64,
                           base_width=4))
