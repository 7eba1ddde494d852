# Train-from-scratch with GN, no frozen stages, 6x schedule (parity:
# reference configs/scratch/scratch_faster_rcnn_r50_fpn_gn_6x.py)
_base_ = "faster_rcnn_r50_fpn_1x.py"
norm_cfg = dict(type="GN", num_groups=32)
model = dict(
    backbone=dict(frozen_stages=-1, norm_cfg=norm_cfg),
    neck=dict(norm_cfg=norm_cfg),
    bbox_head=dict(type="ConvFCBBoxHead", num_shared_convs=4,
                   num_fcs=1, norm_cfg=norm_cfg),
)
lr_config = dict(step=(65, 71))
total_epochs = 73
