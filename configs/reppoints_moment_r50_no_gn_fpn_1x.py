# Moment transform without GN in the towers (parity: reference
# configs/reppoints/reppoints_moment_r50_no_gn_fpn_1x.py)
_base_ = "reppoints_moment_r50_fpn_1x.py"
model = dict(neck=dict(norm_cfg=None),
             bbox_head=dict(norm_cfg=None))
