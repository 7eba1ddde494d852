# HTC x101-64x4d + DCN c3-c5 + multi-scale train — the reference's
# strongest recipe (parity: reference
# configs/htc/htc_dconv_c3-c5_mstrain_400_1400_x101_64x4d_fpn_20e.py)
_base_ = "htc_x101_64x4d_fpn_20e.py"
model = dict(backbone=dict(dcn=dict(modulated=False),
                           stage_with_dcn=(False, True, True, True)))
train_pipeline = dict(img_size=1024, with_mask=True, with_semantic=True,
                      scale_range=(400, 1024))
