# Faster R-CNN R50-FPN with DCNv1 in C3-C5 (parity: reference
# configs/dcn/faster_rcnn_dconv_c3-c5_r50_fpn_1x.py)
model = dict(
    type="FasterRCNN",
    backbone=dict(type="ResNet", depth=50,
                  dcn=dict(modulated=False),
                  stage_with_dcn=(False, True, True, True)),
    neck=dict(type="FPN", in_channels=(256, 512, 1024, 2048),
              out_channels=256, num_outs=5),
    rpn_head=dict(type="RPNHead", in_channels=256, feat_channels=256,
                  num_anchors=3),
    bbox_head=dict(type="SharedFCBBoxHead", num_classes=81,
                   in_channels=256),
    img_size=1024,
)
train_cfg = dict(
    rpn=dict(pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3,
             num_samples=256, pos_fraction=0.5),
    rpn_proposal=dict(nms_pre=2000, nms_post=2000, max_num=2000,
                      nms_thr=0.7),
    rcnn=dict(pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5,
              num_samples=512, pos_fraction=0.25),
)
test_cfg = dict(
    rpn=dict(nms_pre=1000, nms_post=1000, max_num=1000, nms_thr=0.7),
    rcnn=dict(score_thr=0.05, nms_thr=0.5, max_per_img=100),
)
data = dict(
    train=dict(type="CocoDataset", ann_file="data/coco/train.json",
               img_prefix="data/coco/images"),
    test=dict(type="CocoDataset", ann_file="data/coco/val.json",
              img_prefix="data/coco/images", test_mode=True),
)
optimizer = dict(lr=0.02, momentum=0.9, weight_decay=1e-4)
lr_config = dict(warmup_iters=500, warmup_ratio=1.0 / 3, step=(8, 11))
total_epochs = 12
