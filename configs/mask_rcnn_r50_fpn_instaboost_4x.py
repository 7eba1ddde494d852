# Mask R-CNN + InstaBoost, 4x schedule (parity: reference
# configs/instaboost/mask_rcnn_r50_fpn_instaboost_4x.py).
# Requires the `instaboostfast` package at training time.
_base_ = "mask_rcnn_r50_fpn_1x.py"
train_pipeline = dict(img_size=1024, with_mask=True,
                      instaboost=dict(aug_ratio=0.5))
lr_config = dict(step=(32, 44))
total_epochs = 48
