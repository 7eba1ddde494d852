# (parity: reference configs/guided_anchoring/ga_rpn_r101_caffe_rpn_1x.py)
_base_ = "ga_rpn_r50_caffe_fpn_1x.py"
model = dict(backbone=dict(depth=101))
