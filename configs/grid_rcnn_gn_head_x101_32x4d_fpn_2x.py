# (parity: reference configs/grid_rcnn/grid_rcnn_gn_head_x101_32x4d_fpn_2x.py)
_base_ = "grid_rcnn_r50_fpn_2x.py"
model = dict(backbone=dict(type="ResNeXt", depth=101, groups=32,
                           base_width=4))
