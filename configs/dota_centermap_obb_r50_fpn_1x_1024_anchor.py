# Centerness template rendered at full patch resolution
# (parity: reference configs/dota/centermap_obb_r50_fpn_1x_dota_1024_1024_anchor.py:134 anchor_centermap_scale=1024)
_base_ = "dota_centermap_obb_r50_fpn_1x.py"
train_pipeline = dict(centermap_template=1024)
