# (parity: reference configs/dota/centermap_net_tgrs_mask_weight_ms_2x_V4.py)
_base_ = "dota_centermap_net_tgrs_mask_weight_ms_v4.py"
lr_config = dict(step=(16, 22))
total_epochs = 24
