# Fast Mask R-CNN (parity: reference configs/fast_mask_rcnn_r50_fpn_1x.py)
_base_ = "fast_rcnn_r50_fpn_1x.py"
model = dict(mask_head=dict(type="FCNMaskHead", num_classes=81))
