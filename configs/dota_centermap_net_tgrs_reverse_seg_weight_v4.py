# CenterMap-Net TGRS recipe, V4 data, REVERSE seg weights + soft-NMS.
# (parity: reference configs/dota/
# centermap_net_tgrs_mask_weight_reverse_seg_weight_V4.py — recorded
# there: HBB mAP 77.37 / OBB mAP 75.87 @ IoU 0.5, trainval; differs
# from the mask_weight_V4 recipe by reverse heatmap weights and
# nms=dict(type='soft_nms') at test time)
model = dict(
    type="CenterMapNet",
    backbone=dict(type="ResNet", depth=101),
    neck=dict(type="FPN", in_channels=(256, 512, 1024, 2048),
              out_channels=256, num_outs=5),
    rpn_head=dict(type="RPNHead", in_channels=256, feat_channels=256,
                  num_anchors=3),
    bbox_head=dict(type="SharedFCBBoxHead", num_classes=16,
                   in_channels=256),
    mask_head=dict(type="CenterMapHead", num_convs=10, in_channels=256,
                   num_classes=16),
    semantic_head=dict(type="WPSGAHead", in_channels=256, channels=256,
                       num_classes=16),
    img_size=1024)
train_cfg = dict(
    rpn=dict(pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3,
             num_samples=256, pos_fraction=0.5, allowed_border=0),
    rpn_proposal=dict(nms_pre=2000, nms_post=2000, max_num=2000,
                      nms_thr=0.7),
    rcnn=dict(pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5,
              num_samples=512, pos_fraction=0.25, mask_size=28))
test_cfg = dict(
    rpn=dict(nms_pre=2000, nms_post=2000, max_num=2000, nms_thr=0.7),
    rcnn=dict(score_thr=0.05, nms=dict(type="soft_nms", iou_thr=0.5),
              max_per_img=1000))
data = dict(
    train=dict(type="DOTADataset",
               ann_file="data/dota/train_patches.json",
               img_prefix="data/dota/train_patches"),
    test=dict(type="DOTADataset", ann_file="data/dota/val_patches.json",
              img_prefix="data/dota/val_patches", test_mode=True))
train_pipeline = dict(img_size=1024, max_gt=256, flip_ratio=0.5,
                      with_rbox=True, with_mask=True,
                      mask_type="centermap", with_mask_weight=True,
                      with_semantic=True, with_heatmap_weight=True,
                      reverse_heatmap_weight=True)
optimizer = dict(lr=0.02, momentum=0.9, weight_decay=1e-4,
                 grad_clip_norm=35.0)
lr_config = dict(warmup_iters=500, warmup_ratio=1.0 / 3, step=(8, 11))
total_epochs = 12
