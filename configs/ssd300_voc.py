# SSD300 (parity: configs/pascal_voc/ssd300_voc.py)
model = dict(
    type="SSD",
    backbone=dict(type="SSDVGG", input_size=300),
    bbox_head=dict(type="SSDHead", num_classes=21),
    input_size=300, img_size=300)
data = dict(
    train=dict(type="VOCDataset", ann_file="data/voc/train.txt",
               img_prefix="data/voc"),
    test=dict(type="VOCDataset", ann_file="data/voc/val.txt",
              img_prefix="data/voc", test_mode=True))
optimizer = dict(lr=1e-3, weight_decay=5e-4)
total_epochs = 24
