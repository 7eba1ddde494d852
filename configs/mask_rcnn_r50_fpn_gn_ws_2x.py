# (parity: reference configs/gn+ws/mask_rcnn_r50_fpn_gn_ws_2x.py)
_base_ = "mask_rcnn_r50_fpn_gn_2x.py"
model = dict(backbone=dict(conv_cfg=dict(type="ConvWS")))
