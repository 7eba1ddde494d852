# GN with contributed GN-pretrained backbone weights (parity: reference
# configs/gn/mask_rcnn_r50_fpn_gn_contrib_2x.py — differs from
# mask_rcnn_r50_fpn_gn_2x only in the pretrained checkpoint source,
# detectron/resnet50_gn vs contrib/resnet50_gn; load a converted
# checkpoint via tools/torch2jax.py + load_from).
_base_ = "mask_rcnn_r50_fpn_gn_2x.py"
load_from = "work_dirs/pretrained/resnet50_gn_contrib.ckpt"
