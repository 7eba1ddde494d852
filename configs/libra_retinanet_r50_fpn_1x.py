# Libra RetinaNet: BFP-refined FPN + balanced L1 regression (parity:
# reference configs/libra_rcnn/libra_retinanet_r50_fpn_1x.py)
_base_ = "retinanet_r50_fpn_1x.py"
model = dict(
    neck=[dict(type="FPN", in_channels=(256, 512, 1024, 2048),
               out_channels=256, num_outs=5, start_level=1,
               add_extra_convs=True),
          dict(type="BFP", in_channels=256, num_levels=5,
               refine_level=1)],
    loss_bbox=dict(type="BalancedL1Loss", alpha=0.5, gamma=1.5,
                   beta=0.11, loss_weight=1.0),
)
