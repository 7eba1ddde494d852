# OHEM sampler (parity: reference configs/faster_rcnn_ohem_r50_fpn_1x.py)
_base_ = "faster_rcnn_r50_fpn_1x.py"
train_cfg = dict(rcnn=dict(sampler="ohem"))
