# 4-conv CenterMap head (parity: reference configs/dota/dota_v005_centermap_obb_r50_v1_train.py:55 num_convs=4;
# the 10conv variant dota_v006 is this repo's base config)
_base_ = "dota_centermap_obb_r50_fpn_1x.py"
model = dict(mask_head=dict(num_convs=4))
