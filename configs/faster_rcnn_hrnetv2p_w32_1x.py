# (parity: reference configs/hrnet/faster_rcnn_hrnetv2p_w32_1x.py)
_base_ = "faster_rcnn_hrnetv2p_w18_1x.py"
model = dict(backbone=dict(width=32),
             neck=dict(in_channels=(32, 64, 128, 256)))
