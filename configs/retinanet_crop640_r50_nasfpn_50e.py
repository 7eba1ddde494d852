# RetinaNet 640 + NAS-FPN (parity: reference
# configs/nas_fpn/retinanet_crop640_r50_nasfpn_50e.py)
_base_ = "retinanet_crop640_r50_fpn_50e.py"
model = dict(neck=dict(_delete_=True, type="NASFPN",
                       in_channels=(256, 512, 1024, 2048),
                       out_channels=256, num_outs=5, stack_times=7,
                       start_level=1))
