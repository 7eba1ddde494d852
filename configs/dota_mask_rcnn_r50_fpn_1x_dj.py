# (parity: reference configs/dota/mask_rcnn_r50_fpn_1x_dota_DJ.py)
_base_ = "dota_mask_rcnn_r50_fpn_1x.py"
data = dict(
    train=dict(ann_file="data/dota_dj/train_patches.json",
               img_prefix="data/dota_dj/train_patches"),
    test=dict(ann_file="data/dota_dj/val_patches.json",
              img_prefix="data/dota_dj/val_patches", test_mode=True))
