# Fast R-CNN: trains/tests on precomputed proposals, no RPN
# (parity: reference configs/fast_rcnn_r50_fpn_1x.py)
_base_ = "faster_rcnn_r50_fpn_1x.py"
model = dict(type="FastRCNN", rpn_head=None)
