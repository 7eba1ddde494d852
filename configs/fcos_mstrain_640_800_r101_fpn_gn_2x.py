# (parity: reference configs/fcos/
#  fcos_mstrain_640_800_r101_caffe_fpn_gn_2x_4gpu.py)
_base_ = "fcos_r50_fpn_1x.py"
model = dict(backbone=dict(depth=101, style="caffe"))
train_pipeline = dict(img_size=1024, scale_range=(640, 1024))
lr_config = dict(step=(16, 22))
total_epochs = 24
