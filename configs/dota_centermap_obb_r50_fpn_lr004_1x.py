# lr ablation (parity: reference configs/dota/centermap_obb_r50_fpn_lr004_1x_dota.py)
_base_ = "dota_centermap_obb_r50_fpn_1x.py"
optimizer = dict(lr=0.04)
