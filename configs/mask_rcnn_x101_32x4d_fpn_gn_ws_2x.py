# (parity: reference configs/gn+ws/mask_rcnn_x101_32x4d_fpn_gn_ws_2x.py)
_base_ = "mask_rcnn_r50_fpn_gn_ws_2x.py"
model = dict(backbone=dict(_delete_=True, type="ResNeXt", depth=101,
                           groups=32, base_width=4,
                           norm_cfg=dict(type="GN", num_groups=32),
                           conv_cfg=dict(type="ConvWS")))
