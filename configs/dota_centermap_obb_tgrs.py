# CenterMapOBB under the TGRS eval protocol (parity: reference
# configs/dota/centermap_obb_tgrs.py)
_base_ = "dota_centermap_obb_r50_fpn_1x.py"
data = dict(
    train=dict(ann_file="data/dota/trainval_patches.json",
               img_prefix="data/dota/trainval_patches"),
    test=dict(ann_file="data/dota/test_patches.json",
              img_prefix="data/dota/test_patches", test_mode=True))
