# BuildChange v2 chengdu roof extraction (parity: reference
# configs/buildchange/bc_v003_mask_rcnn_r50_v2_chengdu_roof.py)
_base_ = "buildchange_mask_rcnn_r50.py"
data = dict(
    train=dict(ann_file="data/buildchange/v2/chengdu_train.json",
               img_prefix="data/buildchange/v2/chengdu/images"),
    test=dict(ann_file="data/buildchange/v2/chengdu_val.json",
              img_prefix="data/buildchange/v2/chengdu/images",
              test_mode=True))
