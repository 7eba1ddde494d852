# (parity: reference configs/hrnet/mask_rcnn_hrnetv2p_w32_1x.py)
_base_ = "mask_rcnn_hrnetv2p_w18_1x.py"
model = dict(backbone=dict(width=32),
             neck=dict(in_channels=(32, 64, 128, 256)))
