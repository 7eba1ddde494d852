# HTC with semantic branch (parity: reference configs/htc/htc_r50_fpn_1x.py)
model = dict(
    type="HTC",
    backbone=dict(type="ResNet", depth=50),
    neck=dict(type="FPN", in_channels=(256, 512, 1024, 2048),
              out_channels=256, num_outs=5),
    rpn_head=dict(type="RPNHead", in_channels=256, feat_channels=256,
                  num_anchors=3),
    bbox_head=dict(type="SharedFCBBoxHead", num_classes=81,
                   in_channels=256),
    mask_head=dict(type="FCNMaskHead", num_classes=81, in_channels=256),
    semantic_head=dict(type="FusedSemanticHead", num_ins=5,
                       fusion_level=1, in_channels=256,
                       conv_out_channels=256, num_classes=183),
    semantic_fusion=("bbox", "mask"),
    img_size=1024)
data = dict(
    train=dict(type="CocoDataset", ann_file="data/coco/train.json",
               img_prefix="data/coco/images"),
    test=dict(type="CocoDataset", ann_file="data/coco/val.json",
              img_prefix="data/coco/images", test_mode=True))
train_pipeline = dict(img_size=1024, with_mask=True, with_semantic=True)
optimizer = dict(lr=0.02)
lr_config = dict(warmup_iters=500, warmup_ratio=1.0 / 3, step=(8, 11))
total_epochs = 12
