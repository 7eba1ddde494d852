# RandomRotate(choice=(0,90,180,270), ratio=1.0) aug
# (parity: reference configs/dota/centermap_obb_r50_fpn_1x_dota_rotate.py:129)
_base_ = "dota_centermap_obb_r50_fpn_1x.py"
train_pipeline = dict(rotate90_ratio=1.0)
