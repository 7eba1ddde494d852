# (parity: reference configs/gn+ws/mask_rcnn_r50_fpn_gn_ws_20_23_24e.py)
_base_ = "mask_rcnn_r50_fpn_gn_ws_2x.py"
lr_config = dict(step=(20, 23))
total_epochs = 24
