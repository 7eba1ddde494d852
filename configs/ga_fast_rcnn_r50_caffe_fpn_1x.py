# Fast R-CNN trained on precomputed GA-RPN proposals (parity: reference
# configs/guided_anchoring/ga_fast_r50_caffe_fpn_1x.py)
_base_ = "fast_rcnn_r50_fpn_1x.py"
model = dict(backbone=dict(style="caffe"))
train_cfg = dict(
    rcnn=dict(pos_iou_thr=0.6, neg_iou_thr=0.6, min_pos_iou=0.6,
              num_samples=256, pos_fraction=0.25))
