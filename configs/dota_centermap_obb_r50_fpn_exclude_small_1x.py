# Drop tiny instances from training
# (parity: reference configs/dota/centermap_obb_r50_fpn_exclude_small_1x_dota.py:156-158)
_base_ = "dota_centermap_obb_r50_fpn_1x.py"
data = dict(train=dict(min_area=80, max_small_length=12))
