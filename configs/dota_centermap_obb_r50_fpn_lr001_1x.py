# lr ablation (parity: reference configs/dota/centermap_obb_r101_fpn_lr001_1x_dota.py lr axis)
_base_ = "dota_centermap_obb_r50_fpn_1x.py"
optimizer = dict(lr=0.01)
