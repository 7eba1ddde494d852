# SSD300 on COCO (parity: reference configs/ssd300_coco.py)
_base_ = "ssd300_voc.py"
model = dict(bbox_head=dict(num_classes=81))
data = dict(
    train=dict(_delete_=True, type="CocoDataset",
               ann_file="data/coco/train.json",
               img_prefix="data/coco/images"),
    test=dict(_delete_=True, type="CocoDataset",
              ann_file="data/coco/val.json",
              img_prefix="data/coco/images", test_mode=True))
optimizer = dict(lr=2e-3)
lr_config = dict(step=(16, 22))
total_epochs = 24
