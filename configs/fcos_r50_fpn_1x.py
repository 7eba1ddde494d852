# FCOS R50-FPN (parity: configs/fcos/)
model = dict(
    type="FCOS",
    backbone=dict(type="ResNet", depth=50),
    neck=dict(type="FPN", in_channels=(256, 512, 1024, 2048),
              out_channels=256, num_outs=5, start_level=1,
              add_extra_convs=True, extra_convs_on_inputs=False,
              relu_before_extra_convs=True),
    bbox_head=dict(type="FCOSHead", num_classes=81, in_channels=256),
    img_size=1024)
test_cfg = dict(nms_pre=1000, score_thr=0.05, nms_thr=0.5,
                max_per_img=100)
data = dict(
    train=dict(type="CocoDataset", ann_file="data/coco/train.json",
               img_prefix="data/coco/images"),
    test=dict(type="CocoDataset", ann_file="data/coco/val.json",
              img_prefix="data/coco/images", test_mode=True))
optimizer = dict(lr=0.01)
total_epochs = 12
