# GA-RPN proposal model (parity: reference
# configs/guided_anchoring/ga_rpn_r50_caffe_fpn_1x.py)
model = dict(
    type="RPN",
    backbone=dict(type="ResNet", depth=50, style="caffe"),
    neck=dict(type="FPN", in_channels=(256, 512, 1024, 2048),
              out_channels=256, num_outs=5),
    rpn_head=dict(type="GARPNHead", in_channels=256, feat_channels=256),
    ga_target_stds=(0.07, 0.07, 0.14, 0.14),
    ga_loc_filter_thr=0.01,
    img_size=1024,
)
train_cfg = dict(
    rpn=dict(pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3,
             num_samples=256, pos_fraction=0.5))
test_cfg = dict(
    rpn=dict(nms_pre=2000, nms_post=2000, max_num=2000, nms_thr=0.7))
data = dict(
    train=dict(type="CocoDataset", ann_file="data/coco/train.json",
               img_prefix="data/coco/images"),
    test=dict(type="CocoDataset", ann_file="data/coco/val.json",
              img_prefix="data/coco/images", test_mode=True),
)
optimizer = dict(lr=0.02, momentum=0.9, weight_decay=1e-4,
                 grad_clip_norm=35.0)
lr_config = dict(warmup_iters=500, warmup_ratio=1.0 / 3, step=(8, 11))
total_epochs = 12
