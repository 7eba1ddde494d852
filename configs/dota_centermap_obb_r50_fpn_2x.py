# 2x schedule (parity: reference configs/dota/centermap_obb_r50_fpn_2x_dota.py)
_base_ = "dota_centermap_obb_r50_fpn_1x.py"
lr_config = dict(step=(16, 22))
total_epochs = 24
