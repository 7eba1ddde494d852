# DJ data split (parity: reference
# configs/dota/centermap_obb_r50_fpn_lr001_1x_dota_DJ.py — same model,
# alternative patch-split directory layout)
_base_ = "dota_centermap_obb_r50_fpn_lr001_1x.py"
data = dict(
    train=dict(ann_file="data/dota_dj/train_patches.json",
               img_prefix="data/dota_dj/train_patches"),
    test=dict(ann_file="data/dota_dj/val_patches.json",
              img_prefix="data/dota_dj/val_patches", test_mode=True))
