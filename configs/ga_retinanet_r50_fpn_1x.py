# GA-RetinaNet (parity: configs/guided_anchoring/)
model = dict(
    type="GARetinaNet",
    backbone=dict(type="ResNet", depth=50),
    neck=dict(type="FPN", in_channels=(256, 512, 1024, 2048),
              out_channels=256, num_outs=5, start_level=1,
              add_extra_convs=True),
    bbox_head=dict(type="GARetinaHead", num_classes=81,
                   in_channels=256),
    img_size=1024)
data = dict(
    train=dict(type="CocoDataset", ann_file="data/coco/train.json",
               img_prefix="data/coco/images"),
    test=dict(type="CocoDataset", ann_file="data/coco/val.json",
              img_prefix="data/coco/images", test_mode=True))
optimizer = dict(lr=0.01)
total_epochs = 12
