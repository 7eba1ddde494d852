# (parity: reference configs/dota/centermap_net_tgrs_r101_mask_weight_V1.py)
_base_ = "dota_centermap_net_tgrs_mask_weight.py"
model = dict(backbone=dict(depth=101))
