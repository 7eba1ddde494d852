# GA-RetinaNet R101-caffe with multi-scale training, 2x (parity:
# reference configs/guided_anchoring/ga_retinanet_r101_caffe_fpn_mstrain_2x.py)
_base_ = "ga_retinanet_r50_fpn_1x.py"
model = dict(backbone=dict(depth=101, style="caffe"))
train_pipeline = dict(img_size=1024, scale_range=(640, 1024))
lr_config = dict(step=(16, 22))
total_epochs = 24
