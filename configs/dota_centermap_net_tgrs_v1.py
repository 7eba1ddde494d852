# TGRS recipe on the V1 data generation (train split only; parity:
# reference configs/dota/centermap_net_tgrs_V1.py)
_base_ = "dota_centermap_net_tgrs.py"
data = dict(
    train=dict(ann_file="data/dota_v1/train_patches.json",
               img_prefix="data/dota_v1/train_patches"),
    test=dict(ann_file="data/dota_v1/val_patches.json",
              img_prefix="data/dota_v1/val_patches", test_mode=True))
