# HTC minus the semantic branch (parity: reference
# configs/htc/htc_without_semantic_r50_fpn_1x.py)
_base_ = "htc_r50_fpn_1x.py"
model = dict(semantic_head=None)
train_pipeline = dict(img_size=1024, with_mask=True)
