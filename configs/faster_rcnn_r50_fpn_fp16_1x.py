# Mixed precision: the reference's fp16 hook (configs/fp16/faster_rcnn_r50_fpn_fp16_1x.py)
# maps to bf16 compute on TPU (no loss scaling needed; utils/precision.py)
_base_ = "faster_rcnn_r50_fpn_1x.py"
fp16 = dict(loss_scale=512.0)
