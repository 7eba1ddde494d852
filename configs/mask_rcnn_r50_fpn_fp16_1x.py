# (parity: reference configs/fp16/mask_rcnn_r50_fpn_fp16_1x.py); bf16 on TPU
_base_ = "mask_rcnn_r50_fpn_1x.py"
fp16 = dict(loss_scale=512.0)
