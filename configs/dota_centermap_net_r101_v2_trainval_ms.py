# CenterMap-Net R101, V2 data, multi-scale train + TTA test.
# (parity: reference configs/dota/
# dota_v018_centermap_net_r101_v2_trainval_ms.py — recorded there:
# OBB mAP 75.15 / HBB 75.73, trainval; img_scale {1280, 1024, 768}
# multiscale_mode='value' + soft-NMS at test)
_base_ = "dota_centermap_net_tgrs_mask_weight_v4.py"
model = dict(img_size=1280)
test_cfg = dict(rcnn=dict(nms=dict(type="soft_nms")))
data = dict(
    train=dict(ann_file="data/dota/trainval_patches.json",
               img_prefix="data/dota/trainval_patches"))
# multi-scale: sampled target size per batch (the 'value' mode's
# {768, 1024, 1280} ladder expressed as the pipeline's scale_range;
# the static canvas stays img_size² so shapes remain jit-constant)
train_pipeline = dict(img_size=1280, scale_range=(768, 1280))
