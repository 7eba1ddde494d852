# Mask R-CNN on C4 features: bbox branch pools 14 → res5 shared head →
# 7 → avg-pool BBoxHead; mask branch pools 14 → res5 → 7 → 2x deconv →
# 14x14 masks (parity: reference configs/mask_rcnn_r50_caffe_c4_1x.py).
_base_ = "faster_rcnn_r50_caffe_c4_1x.py"
model = dict(
    type="MaskRCNN",
    mask_head=dict(type="FCNMaskHead", num_convs=0, in_channels=2048,
                   conv_out_channels=256, num_classes=81,
                   upsample_ratio=2))
train_pipeline = dict(img_size=1024, with_mask=True)
