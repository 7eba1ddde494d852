# MaskOBB + 90-degree rotation aug
# (parity: reference configs/dota/dota_v008_mask_obb_r50_v1_train_rotation.py)
_base_ = "mask_obb_r50_fpn_1x_dota.py"
train_pipeline = dict(rotate90_ratio=1.0)
