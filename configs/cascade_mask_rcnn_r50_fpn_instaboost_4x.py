# (parity: reference configs/instaboost/
#  cascade_mask_rcnn_r50_fpn_instaboost_4x.py)
_base_ = "cascade_mask_rcnn_r50_fpn_1x.py"
train_pipeline = dict(img_size=1024, with_mask=True,
                      instaboost=dict(aug_ratio=0.5))
lr_config = dict(step=(32, 44))
total_epochs = 48
