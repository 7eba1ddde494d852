# RepPoints min-max (parity: configs/reppoints/)
model = dict(
    type="RepPointsDetector",
    backbone=dict(type="ResNet", depth=50),
    neck=dict(type="FPN", in_channels=(256, 512, 1024, 2048),
              out_channels=256, num_outs=5, start_level=1,
              add_extra_convs=True, extra_convs_on_inputs=False,
              norm_cfg=dict(type="GN", num_groups=32)),
    bbox_head=dict(type="RepPointsHead", num_classes=81,
                   in_channels=256,
                   norm_cfg=dict(type="GN", num_groups=32)),
    transform_method="minmax",
    img_size=1024)
data = dict(
    train=dict(type="CocoDataset", ann_file="data/coco/train.json",
               img_prefix="data/coco/images"),
    test=dict(type="CocoDataset", ann_file="data/coco/val.json",
              img_prefix="data/coco/images", test_mode=True))
optimizer = dict(lr=0.01)
total_epochs = 12
