# (parity: reference configs/guided_anchoring/ga_rpn_x101_32x4d_fpn_1x.py)
_base_ = "ga_rpn_r50_caffe_fpn_1x.py"
model = dict(backbone=dict(_delete_=True, type="ResNeXt", depth=101,
                           groups=32, base_width=4))
