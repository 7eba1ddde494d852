# Point-OBB RBBoxRCNN + rotated-RoI refinement on DOTA
# (BASELINE.json config #3: "faster_rcnn_r50_fpn + rotated RoI align
# with H-based/Point-based OBB heads"; the reference only ever
# regressed OBBs from horizontal RoI crops — the rotated re-crop +
# rtheta refinement stage has no reference counterpart)
model = dict(
    type="RBBoxRCNNRRoI",
    backbone=dict(type="ResNet", depth=50),
    neck=dict(type="FPN", in_channels=(256, 512, 1024, 2048),
              out_channels=256, num_outs=5),
    rpn_head=dict(type="RPNHead", in_channels=256, feat_channels=256,
                  num_anchors=3),
    bbox_head=dict(type="SharedFCBBoxHead", num_classes=16,
                   in_channels=256),
    rbbox_head=dict(type="RBBoxHead", num_classes=16, in_channels=256,
                    encode="pointobb"),
    rbbox_refine_head=dict(type="RBBoxHead", num_classes=16,
                           in_channels=256, encode="rtheta"),
    rbbox_encode="pointobb",
    img_size=1024,
)
train_cfg = dict(
    rpn=dict(pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3,
             num_samples=256, pos_fraction=0.5, allowed_border=0),
    rpn_proposal=dict(nms_pre=2000, nms_post=2000, max_num=2000,
                      nms_thr=0.7),
    rcnn=dict(pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5,
              num_samples=512, pos_fraction=0.25),
)
test_cfg = dict(
    rpn=dict(nms_pre=2000, nms_post=2000, max_num=2000, nms_thr=0.7),
    rcnn=dict(score_thr=0.05, nms_thr=0.5, max_per_img=100),
)
data = dict(
    train=dict(type="DOTADataset",
               ann_file="data/dota/train_patches.json",
               img_prefix="data/dota/train_patches"),
    test=dict(type="DOTADataset",
              ann_file="data/dota/val_patches.json",
              img_prefix="data/dota/val_patches", test_mode=True),
)
train_pipeline = dict(img_size=1024, max_gt=256, flip_ratio=0.5,
                      with_rbox=True, rbox_encode="pointobb")
optimizer = dict(lr=0.02, momentum=0.9, weight_decay=1e-4,
                 grad_clip_norm=35.0)
lr_config = dict(warmup_iters=500, warmup_ratio=1.0 / 3, step=(8, 11))
total_epochs = 12
