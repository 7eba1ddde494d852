# Fast R-CNN on C4 features with res5 shared head (parity: reference
# configs/fast_rcnn_r50_caffe_c4_1x.py): precomputed proposals, no RPN.
_base_ = "faster_rcnn_r50_caffe_c4_1x.py"
model = dict(type="FastRCNN", rpn_head=None)
