# (parity: reference configs/fcos/fcos_mstrain_640_800_x101_64x4d_fpn_gn_2x.py)
_base_ = "fcos_mstrain_640_800_r101_fpn_gn_2x.py"
model = dict(backbone=dict(_delete_=True, type="ResNeXt", depth=101,
                           groups=64, base_width=4))
