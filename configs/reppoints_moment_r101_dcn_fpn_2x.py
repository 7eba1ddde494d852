# (parity: reference configs/reppoints/reppoints_moment_r101_dcn_fpn_2x.py)
_base_ = "reppoints_moment_r101_fpn_2x.py"
model = dict(backbone=dict(dcn=dict(modulated=False),
                           stage_with_dcn=(False, True, True, True)))
