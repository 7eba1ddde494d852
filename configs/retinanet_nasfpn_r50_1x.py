# RetinaNet NAS-FPN R50 (parity: reference
# configs/nas_fpn/retinanet_crop640_r50_nasfpn_50e.py, 1024 canvas)
model = dict(
    type="RetinaNet",
    backbone=dict(type="ResNet", depth=50),
    neck=dict(type="NASFPN", in_channels=(256, 512, 1024, 2048),
              out_channels=256, num_outs=5, stack_times=7,
              start_level=1),
    bbox_head=dict(type="RetinaSepBNHead", num_classes=81,
                   in_channels=256, feat_channels=256,
                   stacked_convs=4, num_anchors=9, num_ins=5),
    img_size=1024,
)
train_cfg = dict(
    assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0),
    allowed_border=-1, pos_weight=-1)
test_cfg = dict(nms_pre=1000, score_thr=0.05, nms_thr=0.5,
                max_per_img=100)
data = dict(
    train=dict(type="CocoDataset", ann_file="data/coco/train.json",
               img_prefix="data/coco/images"),
    test=dict(type="CocoDataset", ann_file="data/coco/val.json",
              img_prefix="data/coco/images", test_mode=True),
)
optimizer = dict(lr=0.08, momentum=0.9, weight_decay=1e-4)
lr_config = dict(warmup_iters=1000, warmup_ratio=0.1, step=(30, 40))
total_epochs = 50
