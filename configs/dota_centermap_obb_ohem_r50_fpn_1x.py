# OHEM rcnn sampler (parity: reference configs/dota/centermap_obb_ohem_r50_fpn_1x_dota.py)
_base_ = "dota_centermap_obb_r50_fpn_1x.py"
train_cfg = dict(rcnn=dict(sampler="ohem"))
