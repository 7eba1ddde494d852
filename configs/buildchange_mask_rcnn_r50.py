# BuildChange roof extraction (parity: configs/buildchange/)
model = dict(
    type="MaskRCNN",
    backbone=dict(type="ResNet", depth=50),
    neck=dict(type="FPN", in_channels=(256, 512, 1024, 2048),
              out_channels=256, num_outs=5),
    rpn_head=dict(type="RPNHead", in_channels=256, feat_channels=256,
                  num_anchors=3),
    bbox_head=dict(type="SharedFCBBoxHead", num_classes=2,
                   in_channels=256),
    mask_head=dict(type="FCNMaskHead", num_classes=2, in_channels=256),
    img_size=1024)
data = dict(
    train=dict(type="BuildChangeDataset",
               ann_file="data/buildchange/train.json",
               img_prefix="data/buildchange/images"),
    test=dict(type="BuildChangeDataset",
              ann_file="data/buildchange/val.json",
              img_prefix="data/buildchange/images", test_mode=True))
train_pipeline = dict(img_size=1024, with_mask=True, with_rbox=False)
optimizer = dict(lr=0.02)
total_epochs = 12
