# (parity: reference configs/fast_mask_rcnn_r50_caffe_c4_1x.py)
_base_ = "mask_rcnn_r50_caffe_c4_1x.py"
model = dict(type="FastRCNN", rpn_head=None)
