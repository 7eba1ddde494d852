# BuildChange v2 beijing roof extraction (parity: reference
# configs/buildchange/bc_v005_mask_rcnn_r50_v2_beijing_roof.py)
_base_ = "buildchange_mask_rcnn_r50.py"
data = dict(
    train=dict(ann_file="data/buildchange/v2/beijing_train.json",
               img_prefix="data/buildchange/v2/beijing/images"),
    test=dict(ann_file="data/buildchange/v2/beijing_val.json",
              img_prefix="data/buildchange/v2/beijing/images",
              test_mode=True))
