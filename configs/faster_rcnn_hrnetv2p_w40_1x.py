# (parity: reference configs/hrnet/faster_rcnn_hrnetv2p_w40_1x.py)
_base_ = "faster_rcnn_hrnetv2p_w18_1x.py"
model = dict(backbone=dict(width=40),
             neck=dict(in_channels=(40, 80, 160, 320)))
