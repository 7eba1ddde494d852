# RetinaNet 640-crop baseline for the NAS-FPN comparison (parity:
# reference configs/nas_fpn/retinanet_crop640_r50_fpn_50e.py)
_base_ = "retinanet_r50_fpn_1x.py"
model = dict(
    img_size=640,
    neck=dict(relu_before_extra_convs=True),
    bbox_head=dict(_delete_=True, type="RetinaSepBNHead", num_classes=81,
                   in_channels=256, feat_channels=256, stacked_convs=4,
                   num_anchors=9, num_ins=5))
train_pipeline = dict(img_size=640)
optimizer = dict(lr=0.08, weight_decay=1e-4)
lr_config = dict(warmup_iters=1000, warmup_ratio=0.1, step=(30, 40))
total_epochs = 50
