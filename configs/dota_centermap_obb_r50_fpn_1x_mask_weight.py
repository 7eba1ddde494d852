# CenterMapOBB + per-instance mask weights (parity: reference
# configs/dota/centermap_obb_r50_fpn_1x_dota_mask_weight.py)
_base_ = "dota_centermap_obb_r50_fpn_1x.py"
train_pipeline = dict(img_size=1024, with_rbox=True, with_mask=True,
                      mask_type="centermap", with_mask_weight=True)
