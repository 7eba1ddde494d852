# SSD300 face detector (parity: reference
# configs/wider_face/ssd300_wider_face.py)
_base_ = "ssd300_voc.py"
model = dict(bbox_head=dict(num_classes=2))
data = dict(
    train=dict(_delete_=True, type="WIDERFaceDataset",
               ann_file="data/WIDERFace/train.txt",
               img_prefix="data/WIDERFace/WIDER_train"),
    test=dict(_delete_=True, type="WIDERFaceDataset",
              ann_file="data/WIDERFace/val.txt",
              img_prefix="data/WIDERFace/WIDER_val", test_mode=True))
optimizer = dict(lr=0.012, weight_decay=5e-4)
lr_config = dict(step=(16, 20))
total_epochs = 24
