# Proposal-only RPN on C4 features (parity: reference
# configs/rpn_r50_caffe_c4_1x.py).
model = dict(
    type="RPN",
    backbone=dict(type="ResNet", depth=50, num_stages=3,
                  out_indices=(2,), frozen_stages=1, style="caffe"),
    neck=dict(type="Identity"),
    rpn_head=dict(type="RPNHead", in_channels=1024, feat_channels=1024,
                  num_anchors=15),
    strides=(16,),
    anchor_scales=(2, 4, 8, 16, 32),
    img_size=1024,
)
train_cfg = dict(
    rpn=dict(pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3,
             num_samples=256, pos_fraction=0.5, allowed_border=0))
test_cfg = dict(
    rpn=dict(nms_pre=12000, nms_post=2000, max_num=2000, nms_thr=0.7))
data = dict(
    train=dict(type="CocoDataset", ann_file="data/coco/train.json",
               img_prefix="data/coco/images"),
    test=dict(type="CocoDataset", ann_file="data/coco/val.json",
              img_prefix="data/coco/images", test_mode=True),
)
optimizer = dict(lr=0.02, momentum=0.9, weight_decay=1e-4,
                 grad_clip_norm=35.0)
lr_config = dict(warmup_iters=500, warmup_ratio=1.0 / 3, step=(8, 11))
total_epochs = 12
