# (parity: reference configs/instaboost/ssd300_coco_instaboost_4x.py)
_base_ = "ssd300_coco.py"
train_pipeline = dict(img_size=300, instaboost=dict(aug_ratio=0.5))
lr_config = dict(step=(32, 44))
total_epochs = 48
