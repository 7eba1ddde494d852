# GN + weight standardisation (parity: reference configs/gn+ws/faster_rcnn_r50_fpn_gn_ws_1x.py)
_base_ = "faster_rcnn_r50_fpn_1x.py"
norm_cfg = dict(type="GN", num_groups=32)
model = dict(
    backbone=dict(norm_cfg=norm_cfg, conv_cfg=dict(type="ConvWS")),
    neck=dict(norm_cfg=norm_cfg),
    bbox_head=dict(type="ConvFCBBoxHead", num_shared_convs=4,
                   num_fcs=1, norm_cfg=norm_cfg),
)
