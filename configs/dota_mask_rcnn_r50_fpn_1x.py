# Plain (HBB) Mask R-CNN on DOTA patches (parity: reference
# configs/dota/mask_rcnn_r50_fpn_1x_dota.py)
_base_ = "mask_rcnn_r50_fpn_1x.py"
model = dict(bbox_head=dict(num_classes=16),
             mask_head=dict(num_classes=16))
data = dict(
    train=dict(_delete_=True, type="DOTADataset",
               ann_file="data/dota/train_patches.json",
               img_prefix="data/dota/train_patches"),
    test=dict(_delete_=True, type="DOTADataset",
              ann_file="data/dota/val_patches.json",
              img_prefix="data/dota/val_patches", test_mode=True))
