# Theta-OBB + OHEM rcnn sampler (reference OHEM-axis parity, configs/dota/centermap_obb_ohem_r50_fpn_1x_dota.py)
_base_ = "dota_theta_obb_r50_fpn_1x.py"
train_cfg = dict(rcnn=dict(sampler="ohem"))
