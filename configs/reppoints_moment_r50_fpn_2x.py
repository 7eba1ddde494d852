# (parity: reference configs/reppoints/reppoints_moment_r50_fpn_2x.py)
_base_ = "reppoints_moment_r50_fpn_1x.py"
lr_config = dict(step=(16, 22))
total_epochs = 24
