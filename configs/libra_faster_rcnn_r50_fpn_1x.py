# Libra R-CNN: FPN + BFP, balanced L1 (parity: configs/libra_rcnn/)
model = dict(
    type="FasterRCNN",
    backbone=dict(type="ResNet", depth=50),
    neck=[dict(type="FPN", in_channels=(256, 512, 1024, 2048),
               out_channels=256, num_outs=5),
          dict(type="BFP", in_channels=256, num_levels=5)],
    rpn_head=dict(type="RPNHead", in_channels=256, feat_channels=256,
                  num_anchors=3),
    bbox_head=dict(type="SharedFCBBoxHead", num_classes=81,
                   in_channels=256),
    img_size=1024)
# note: stack BFP after FPN by wrapping in apis or a composed neck;
# the BFP module itself lives at aidet_tpu.models.necks.BFP
# Libra sampling (parity: configs/libra_rcnn CombinedSampler —
# InstanceBalancedPosSampler + IoUBalancedNegSampler(floor_thr=-1,
# floor_fraction=0, num_bins=3))
train_cfg = dict(
    rcnn=dict(pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5,
              num_samples=512, pos_fraction=0.25, sampler="combined",
              floor_thr=-1.0, floor_fraction=0.0, num_bins=3))
data = dict(
    train=dict(type="CocoDataset", ann_file="data/coco/train.json",
               img_prefix="data/coco/images"),
    test=dict(type="CocoDataset", ann_file="data/coco/val.json",
              img_prefix="data/coco/images", test_mode=True))
optimizer = dict(lr=0.02)
total_epochs = 12
