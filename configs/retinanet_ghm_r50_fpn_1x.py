# RetinaNet R50-FPN with gradient-harmonizing losses
# (parity: reference configs/ghm/retinanet_ghm_r50_fpn_1x.py)
model = dict(
    type="RetinaNet",
    backbone=dict(type="ResNet", depth=50),
    neck=dict(type="FPN", in_channels=(256, 512, 1024, 2048),
              out_channels=256, num_outs=5, start_level=1,
              add_extra_convs=True),
    bbox_head=dict(type="RetinaHead", num_classes=81, in_channels=256,
                   feat_channels=256, stacked_convs=4, num_anchors=9),
    loss_cls=dict(type="GHMC", bins=30, momentum=0.75,
                  use_sigmoid=True, loss_weight=1.0),
    loss_bbox=dict(type="GHMR", mu=0.02, bins=10, momentum=0.7,
                   loss_weight=10.0),
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
optimizer = dict(lr=0.01, momentum=0.9, weight_decay=1e-4)
lr_config = dict(warmup_iters=500, warmup_ratio=1.0 / 3, step=(8, 11))
total_epochs = 12
