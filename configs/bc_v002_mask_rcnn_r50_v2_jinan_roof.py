# BuildChange v2 jinan roof extraction (parity: reference
# configs/buildchange/bc_v002_mask_rcnn_r50_v2_jinan_roof.py)
_base_ = "buildchange_mask_rcnn_r50.py"
data = dict(
    train=dict(ann_file="data/buildchange/v2/jinan_train.json",
               img_prefix="data/buildchange/v2/jinan/images"),
    test=dict(ann_file="data/buildchange/v2/jinan_val.json",
              img_prefix="data/buildchange/v2/jinan/images",
              test_mode=True))
