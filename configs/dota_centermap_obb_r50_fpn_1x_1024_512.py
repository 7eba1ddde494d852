# (parity: reference configs/dota/dota_v011_centermap_obb_r50_v1_train_1024_512.py)
_base_ = "dota_centermap_obb_r50_fpn_1x.py"
data = dict(
    train=dict(ann_file="data/dota_1024_512/train_patches.json",
               img_prefix="data/dota_1024_512/train_patches"),
    test=dict(ann_file="data/dota_1024_512/val_patches.json",
              img_prefix="data/dota_1024_512/val_patches",
              test_mode=True))
