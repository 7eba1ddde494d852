# Multi-scale-train variant (parity: reference
# configs/reppoints/reppoints_moment_r50_fpn_2x_mt.py)
_base_ = "reppoints_moment_r50_fpn_2x.py"
train_pipeline = dict(img_size=1024, scale_range=(480, 1024))
