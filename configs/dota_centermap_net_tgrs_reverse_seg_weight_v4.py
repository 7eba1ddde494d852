# CenterMap-Net TGRS recipe, V4 data, REVERSE seg weights + soft-NMS.
# (parity: reference configs/dota/
# centermap_net_tgrs_mask_weight_reverse_seg_weight_V4.py — recorded
# there: HBB mAP 77.37 / OBB mAP 75.87 @ IoU 0.5, trainval; differs
# from the mask_weight_V4 recipe by reverse heatmap weights and
# nms=dict(type='soft_nms') at test time)
_base_ = "dota_centermap_net_tgrs_mask_weight_v4.py"
test_cfg = dict(rcnn=dict(nms=dict(type="soft_nms")))
train_pipeline = dict(reverse_heatmap_weight=True)
