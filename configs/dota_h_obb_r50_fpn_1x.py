# H-OBB RBBoxRCNN (parity: configs/dota/dota_v004_h_obb_r50_v1_train.py)
model = dict(
    type="RBBoxRCNN",
    backbone=dict(type="ResNet", depth=50),
    neck=dict(type="FPN", in_channels=(256, 512, 1024, 2048),
              out_channels=256, num_outs=5),
    rpn_head=dict(type="RPNHead", in_channels=256, feat_channels=256,
                  num_anchors=3),
    bbox_head=dict(type="SharedFCBBoxHead", num_classes=16,
                   in_channels=256),
    rbbox_head=dict(type="RBBoxHead", num_classes=16, in_channels=256,
                    encode="hobb"),
    rbbox_encode="hobb", img_size=1024)
data = dict(
    train=dict(type="DOTADataset",
               ann_file="data/dota/train_patches.json",
               img_prefix="data/dota/train_patches"),
    test=dict(type="DOTADataset", ann_file="data/dota/val_patches.json",
              img_prefix="data/dota/val_patches", test_mode=True))
train_pipeline = dict(img_size=1024, with_rbox=True, rbox_encode="hobb")
optimizer = dict(lr=0.02)
total_epochs = 12
