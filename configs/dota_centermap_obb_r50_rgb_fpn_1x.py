# DOTA-statistics normalisation, no channel swap
# (parity: reference configs/dota/centermap_obb_r50_rgb_fpn_1x_dota.py:123)
_base_ = "dota_centermap_obb_r50_fpn_1x.py"
train_pipeline = dict(mean=[77.91, 82.34, 81.30],
                      std=[28.88, 29.71, 30.90], to_rgb=False)
test_pipeline = dict(mean=[77.91, 82.34, 81.30],
                     std=[28.88, 29.71, 30.90], to_rgb=False)
