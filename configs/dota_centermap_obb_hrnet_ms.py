# BASELINE config #5: CenterMap OBB with HRNetV2p-W32 + HRFPN,
# multi-scale train + multi-scale/flip test (TTA), full-scene tile
# merge via global rotated NMS (tools/test.py --tta; parity:
# reference configs/hrnet/* backbone family + the centermap_obb
# multi-scale protocol of configs/dota/centermap_net_tgrs_*_ms_V4.py).
model = dict(
    type="CenterMapOBB",
    backbone=dict(type="HRNet", width=32),
    neck=dict(type="HRFPN", in_channels=(32, 64, 128, 256),
              out_channels=256, num_outs=5),
    rpn_head=dict(type="RPNHead", in_channels=256, feat_channels=256,
                  num_anchors=3),
    bbox_head=dict(type="SharedFCBBoxHead", num_classes=16,
                   in_channels=256),
    mask_head=dict(type="CenterMapHead", num_convs=10, in_channels=256,
                   conv_out_channels=256, num_classes=16),
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
                      with_rbox=True, with_mask=True,
                      scale_range=(768, 1024))
# multi-scale + flip TTA at test: per-variant OBBs come from the
# predicted centermaps via min-area-rect, fused by per-class rotated
# NMS before the scene-level tile merge
tta = dict(scales=(768, 1024), flip=True)
optimizer = dict(lr=0.02, momentum=0.9, weight_decay=1e-4,
                 grad_clip_norm=35.0)
lr_config = dict(warmup_iters=500, warmup_ratio=1.0 / 3, step=(8, 11))
total_epochs = 12
