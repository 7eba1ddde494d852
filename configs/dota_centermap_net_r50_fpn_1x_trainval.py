# Train on train+val patches (parity: reference configs/dota/dota_v014_centermap_net_r50_v1_trainval.py)
_base_ = "centermap_net_r50_fpn_1x.py"
data = dict(
    train=[dict(type="DOTADataset",
                ann_file="data/dota/train_patches.json",
                img_prefix="data/dota/train_patches"),
           dict(type="DOTADataset",
                ann_file="data/dota/val_patches.json",
                img_prefix="data/dota/val_patches")],
)
