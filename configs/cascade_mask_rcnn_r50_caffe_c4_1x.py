# (parity: reference configs/cascade_mask_rcnn_r50_caffe_c4_1x.py)
_base_ = "cascade_rcnn_r50_caffe_c4_1x.py"
model = dict(
    mask_head=dict(type="FCNMaskHead", num_convs=0, in_channels=2048,
                   conv_out_channels=256, num_classes=81,
                   upsample_ratio=2))
train_pipeline = dict(img_size=1024, with_mask=True)
