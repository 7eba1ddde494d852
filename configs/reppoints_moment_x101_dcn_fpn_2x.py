# (parity: reference configs/reppoints/reppoints_moment_x101_dcn_fpn_2x.py)
_base_ = "reppoints_moment_r50_fpn_2x.py"
model = dict(backbone=dict(_delete_=True, type="ResNeXt", depth=101,
                           groups=32, base_width=4,
                           dcn=dict(modulated=False),
                           stage_with_dcn=(False, True, True, True)))
