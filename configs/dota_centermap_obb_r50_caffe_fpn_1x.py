# Caffe-style backbone + BGR caffe normalisation
# (parity: reference configs/dota/centermap_obb_r50_caffe_fpn_1x_dota.py:4-12,123)
_base_ = "dota_centermap_obb_r50_fpn_1x.py"
model = dict(backbone=dict(style="caffe"))
train_pipeline = dict(mean=[102.9801, 115.9465, 122.7717],
                      std=[1.0, 1.0, 1.0], to_rgb=False)
test_pipeline = dict(mean=[102.9801, 115.9465, 122.7717],
                     std=[1.0, 1.0, 1.0], to_rgb=False)
