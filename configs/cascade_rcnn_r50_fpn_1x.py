# Cascade R-CNN R50-FPN 1x (parity: configs/cascade_rcnn_r50_fpn_1x.py)
model = dict(
    type="CascadeRCNN",
    backbone=dict(type="ResNet", depth=50),
    neck=dict(type="FPN", in_channels=(256, 512, 1024, 2048),
              out_channels=256, num_outs=5),
    rpn_head=dict(type="RPNHead", in_channels=256, feat_channels=256,
                  num_anchors=3),
    bbox_head=dict(type="SharedFCBBoxHead", num_classes=81,
                   in_channels=256),
    num_stages=3, img_size=1024)
train_cfg = dict(rcnn=dict(num_samples=512))
test_cfg = dict(rcnn=dict(max_per_img=100))
data = dict(
    train=dict(type="CocoDataset", ann_file="data/coco/train.json",
               img_prefix="data/coco/images"),
    test=dict(type="CocoDataset", ann_file="data/coco/val.json",
              img_prefix="data/coco/images", test_mode=True))
optimizer = dict(lr=0.02)
lr_config = dict(step=(8, 11))
total_epochs = 12
