# Per-city BuildChange roof model (parity: reference
# configs/buildchange/bc_v00*_mask_rcnn_r50_v2_jinan_roof.py — train on
# one city, evaluate cross-city via tools/buildchange_eval.py --city)
_base_ = "buildchange_mask_rcnn_r50.py"
city = "jinan"
data = dict(
    train=dict(ann_file="data/buildchange/annotations/train_jinan.json",
               img_prefix="data/buildchange/jinan/images"),
    test=dict(ann_file="data/buildchange/annotations/val_jinan.json",
              img_prefix="data/buildchange/jinan/images"))
