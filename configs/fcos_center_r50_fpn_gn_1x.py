# FCOS with center sampling (parity: reference
# configs/fcos/fcos_center_r50_caffe_fpn_gn_1x_4gpu.py.py)
_base_ = "fcos_r50_fpn_1x.py"
model = dict(backbone=dict(style="caffe"),
             center_sampling=True, center_sample_radius=1.5)
