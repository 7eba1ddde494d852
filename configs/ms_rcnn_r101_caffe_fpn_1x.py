# (parity: reference configs/ms_rcnn/ms_rcnn_r101_caffe_fpn_1x.py)
_base_ = "ms_rcnn_r50_fpn_1x.py"
model = dict(backbone=dict(depth=101, style="caffe"))
