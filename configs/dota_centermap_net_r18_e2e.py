"""Results (val scenes, synthetic devkit dota_e2e_xl, R18@512 GN 12ep from scratch):
    OBB mAP@0.5: 0.3181    HBB mAP@0.5: 0.4009
(recorded by tools/publish_results.py — the reference's
config-docstring convention, configs/dota/dota_v002_theta_obb_r50_v1_train.py:2-8)
"""
# Tiny e2e variant of dota_centermap_net_tgrs_mask_weight_v4.py (R18@512, the round-2-proven
# synthetic-devkit recipe): relative per-encoding quality on the
# realistic-angle set, not absolute scale.
_base_ = "dota_centermap_net_tgrs_mask_weight_v4.py"
# GN backbone/neck: this recipe trains FROM SCRATCH on the synthetic
# devkit, where FrozenBN (reference fine-tuning semantics) gives no
# activation-scale control and the unnormalized net drifts to an
# activation explosion by ~epoch 15 (round-3 post-mortem).
model = dict(
    backbone=dict(depth=18, norm_cfg=dict(type="GN", num_groups=32)),
    neck=dict(in_channels=(64, 128, 256, 512), out_channels=128,
              norm_cfg=dict(type="GN", num_groups=32)),
    img_size=512,
    rpn_head=dict(in_channels=128, feat_channels=128),
    bbox_head=dict(in_channels=128, fc_out_channels=512),
    mask_head=dict(in_channels=128, conv_out_channels=128,
                   num_convs=4),
    semantic_head=dict(in_channels=128, channels=128),
)
data = dict(
    train=dict(ann_file="data/dota_e2e_xl/train_patches.json",
               img_prefix="data/dota_e2e_xl/train_patches"),
    test=dict(ann_file="data/dota_e2e_xl/val_patches.json",
              img_prefix="data/dota_e2e_xl/val_patches"),
)
train_pipeline = dict(img_size=512, max_gt=128)
optimizer = dict(lr=0.004, grad_clip_norm=10.0)
lr_config = dict(warmup_iters=200, step=(9, 11))
total_epochs = 12
batch_size = 2
