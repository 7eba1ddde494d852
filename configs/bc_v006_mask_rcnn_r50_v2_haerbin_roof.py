# BuildChange v2 haerbin roof extraction (parity: reference
# configs/buildchange/bc_v006_mask_rcnn_r50_v2_haerbin_roof.py)
_base_ = "buildchange_mask_rcnn_r50.py"
data = dict(
    train=dict(ann_file="data/buildchange/v2/haerbin_train.json",
               img_prefix="data/buildchange/v2/haerbin/images"),
    test=dict(ann_file="data/buildchange/v2/haerbin_val.json",
              img_prefix="data/buildchange/v2/haerbin/images",
              test_mode=True))
