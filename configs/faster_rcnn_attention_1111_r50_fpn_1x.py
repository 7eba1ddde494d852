# Empirical attention '1111' (all four terms) in ResNet stages 3-4
# (parity: reference configs/empirical_attention/
#  faster_rcnn_r50_fpn_attention_1111_1x.py)
_base_ = "faster_rcnn_attention_0010_r50_fpn_1x.py"
model = dict(backbone=dict(gen_attention=dict(attention_type="1111")))
