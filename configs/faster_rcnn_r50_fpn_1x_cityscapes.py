# Cityscapes detection (parity: reference
# configs/cityscapes/faster_rcnn_r50_fpn_1x_cityscapes.py)
_base_ = "faster_rcnn_r50_fpn_1x.py"
model = dict(bbox_head=dict(num_classes=9))
data = dict(
    train=dict(_delete_=True, type="CityscapesDataset",
               ann_file="data/cityscapes/train.json",
               img_prefix="data/cityscapes/images"),
    test=dict(_delete_=True, type="CityscapesDataset",
              ann_file="data/cityscapes/val.json",
              img_prefix="data/cityscapes/images", test_mode=True),
)
optimizer = dict(lr=0.01)
lr_config = dict(step=(7,))
total_epochs = 8
