# Faster R-CNN R50-C4 1x (parity: reference
# configs/faster_rcnn_r50_caffe_c4_1x.py): no neck — RPN and RoI heads
# ride the single C4 stage (stride 16); rois pool at 14 and run the
# res5 ResLayer shared head down to 7x7x2048 before an avg-pool
# BBoxHead. Caffe-style bottlenecks (stride on the first 1x1).
model = dict(
    type="FasterRCNN",
    backbone=dict(type="ResNet", depth=50, num_stages=3,
                  out_indices=(2,), frozen_stages=1, style="caffe"),
    neck=dict(type="Identity"),
    shared_head=dict(type="ResLayer", depth=50, stage=3, stride=2,
                     style="caffe"),
    rpn_head=dict(type="RPNHead", in_channels=1024, feat_channels=1024,
                  num_anchors=15),
    bbox_head=dict(type="BBoxHead", with_avg_pool=True, num_classes=81,
                   in_channels=2048, roi_feat_size=7),
    strides=(16,),
    anchor_scales=(2, 4, 8, 16, 32),
    img_size=1024,
)
train_cfg = dict(
    rpn=dict(pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3,
             num_samples=256, pos_fraction=0.5, allowed_border=0),
    rpn_proposal=dict(nms_pre=12000, nms_post=2000, max_num=2000,
                      nms_thr=0.7),
    rcnn=dict(pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5,
              num_samples=512, pos_fraction=0.25),
)
test_cfg = dict(
    rpn=dict(nms_pre=6000, nms_post=1000, max_num=1000, nms_thr=0.7),
    rcnn=dict(score_thr=0.05, nms_thr=0.5, max_per_img=100),
)
data = dict(
    train=dict(type="CocoDataset", ann_file="data/coco/train.json",
               img_prefix="data/coco/images"),
    test=dict(type="CocoDataset", ann_file="data/coco/val.json",
              img_prefix="data/coco/images", test_mode=True),
)
optimizer = dict(type="SGD", lr=0.02, momentum=0.9, weight_decay=1e-4)
lr_config = dict(policy="step", warmup="linear", warmup_iters=500,
                 warmup_ratio=1.0 / 3, step=(8, 11))
total_epochs = 12
