# Mask R-CNN with an albumentations augmentation stage (parity:
# reference configs/albu_example/mask_rcnn_r50_fpn_1x.py).
# Requires the `albumentations` package at training time.
_base_ = "mask_rcnn_r50_fpn_1x.py"
train_pipeline = dict(
    img_size=1024, with_mask=True,
    albu=[
        dict(type="ShiftScaleRotate", shift_limit=0.0625,
             scale_limit=0.0, rotate_limit=0, interpolation=1, p=0.5),
        dict(type="RandomBrightnessContrast", brightness_limit=(0.1, 0.3),
             contrast_limit=(0.1, 0.3), p=0.2),
        dict(type="ChannelShuffle", p=0.1),
        dict(type="OneOf", transforms=[
            dict(type="Blur", blur_limit=3, p=1.0),
            dict(type="MedianBlur", blur_limit=3, p=1.0)], p=0.1),
    ])
