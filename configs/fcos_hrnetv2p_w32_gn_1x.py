# FCOS on HRNet-w32 + HRFPN (parity: reference
# configs/hrnet/fcos_hrnetv2p_w32_gn_1x_4gpu.py)
_base_ = "fcos_r50_fpn_1x.py"
model = dict(backbone=dict(_delete_=True, type="HRNet", width=32),
             neck=dict(_delete_=True, type="HRFPN",
                       in_channels=(32, 64, 128, 256),
                       out_channels=256, num_outs=5))
