# Theta-OBB 2x schedule (reference schedule-axis parity, configs/dota/centermap_obb_r50_fpn_2x_dota.py applied to the theta family)
_base_ = "dota_theta_obb_r50_fpn_1x.py"
lr_config = dict(step=(16, 22))
total_epochs = 24
