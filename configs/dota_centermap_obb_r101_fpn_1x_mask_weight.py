# (parity: reference configs/dota/centermap_obb_r101_fpn_1x_dota_mask_weight.py)
_base_ = "dota_centermap_obb_r50_fpn_1x_mask_weight.py"
model = dict(backbone=dict(depth=101))
