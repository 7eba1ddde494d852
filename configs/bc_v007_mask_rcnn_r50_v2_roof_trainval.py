# BuildChange v2 all-city trainval (parity: reference
# configs/buildchange/bc_v007_mask_rcnn_r50_v2_roof_trainval.py)
_base_ = "buildchange_mask_rcnn_r50.py"
data = dict(
    train=dict(ann_file="data/buildchange/v2/trainval.json",
               img_prefix="data/buildchange/v2/images"),
    test=dict(ann_file="data/buildchange/v2/test.json",
              img_prefix="data/buildchange/v2/images", test_mode=True))
