# Rotated RetinaNet: theta-OBB regression + rotated NMS on DOTA
# (BASELINE.json config #2: "retinanet_r50_fpn Theta-based OBB on DOTA
# 1024x1024 patches (rotated NMS)"; the reference had no single-stage
# OBB detector — anchors/assigner follow its retinanet_r50_fpn_1x.py)
model = dict(
    type="RetinaNetOBB",
    backbone=dict(type="ResNet", depth=50),
    neck=dict(type="FPN", in_channels=(256, 512, 1024, 2048),
              out_channels=256, num_outs=5, start_level=1,
              add_extra_convs=True),
    bbox_head=dict(type="RetinaHead", num_classes=16, in_channels=256,
                   feat_channels=256, stacked_convs=4, num_anchors=9,
                   reg_dim=5),
    rbox_encode="thetaobb",
    img_size=1024,
)
train_cfg = dict(
    assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0),
    allowed_border=-1, pos_weight=-1)
test_cfg = dict(nms_pre=1000, score_thr=0.05, rnms_thr=0.1,
                max_per_img=100)
data = dict(
    train=dict(type="DOTADataset",
               ann_file="data/dota/train_patches.json",
               img_prefix="data/dota/train_patches"),
    test=dict(type="DOTADataset",
              ann_file="data/dota/val_patches.json",
              img_prefix="data/dota/val_patches", test_mode=True),
)
train_pipeline = dict(img_size=1024, max_gt=256, flip_ratio=0.5,
                      with_rbox=True, rbox_encode="thetaobb")
optimizer = dict(lr=0.01, momentum=0.9, weight_decay=1e-4,
                 grad_clip_norm=35.0)
lr_config = dict(warmup_iters=500, warmup_ratio=1.0 / 3, step=(8, 11))
total_epochs = 12
