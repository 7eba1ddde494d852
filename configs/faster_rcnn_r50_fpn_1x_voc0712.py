# Faster R-CNN on VOC07+12 (parity: reference configs/pascal_voc/faster_rcnn_r50_fpn_1x_voc0712.py)
_base_ = "faster_rcnn_r50_fpn_1x.py"
model = dict(bbox_head=dict(num_classes=21))
data = dict(
    train=[dict(type="VOCDataset", ann_file="data/voc/VOC2007/train.txt",
                img_prefix="data/voc/VOC2007"),
           dict(type="VOCDataset", ann_file="data/voc/VOC2012/train.txt",
                img_prefix="data/voc/VOC2012")],
    test=dict(type="VOCDataset", ann_file="data/voc/VOC2007/val.txt",
              img_prefix="data/voc/VOC2007", test_mode=True),
)
optimizer = dict(lr=0.01)
lr_config = dict(step=(3,))
total_epochs = 4
