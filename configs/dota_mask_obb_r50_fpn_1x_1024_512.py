# 1024-patch / 512-stride tiling variant (parity: reference
# configs/dota/dota_v010_mask_obb_r50_v1_train_1024_512.py — regenerate
# patches with tools/prepare_dota.py --patch-size 1024 --stride 512)
_base_ = "mask_obb_r50_fpn_1x_dota.py"
data = dict(
    train=dict(ann_file="data/dota_1024_512/train_patches.json",
               img_prefix="data/dota_1024_512/train_patches"),
    test=dict(ann_file="data/dota_1024_512/val_patches.json",
              img_prefix="data/dota_1024_512/val_patches",
              test_mode=True))
