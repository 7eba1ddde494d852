# BuildChange v2 shanghai roof extraction (parity: reference
# configs/buildchange/bc_v004_mask_rcnn_r50_v2_shanghai_roof.py)
_base_ = "buildchange_mask_rcnn_r50.py"
data = dict(
    train=dict(ann_file="data/buildchange/v2/shanghai_train.json",
               img_prefix="data/buildchange/v2/shanghai/images"),
    test=dict(ann_file="data/buildchange/v2/shanghai_val.json",
              img_prefix="data/buildchange/v2/shanghai/images",
              test_mode=True))
