# HTC-style cascade + mask (parity: configs/htc/)
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
    img_size=1024)
data = dict(
    train=dict(type="CocoDataset", ann_file="data/coco/train.json",
               img_prefix="data/coco/images"),
    test=dict(type="CocoDataset", ann_file="data/coco/val.json",
              img_prefix="data/coco/images", test_mode=True))
train_pipeline = dict(img_size=1024, with_mask=True)
optimizer = dict(lr=0.02)
total_epochs = 20
