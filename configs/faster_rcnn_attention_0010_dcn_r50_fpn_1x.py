# Empirical attention '0010' + DCN c3-c5 (parity: reference
# configs/empirical_attention/faster_rcnn_r50_fpn_attention_0010_dcn_1x.py)
_base_ = "faster_rcnn_attention_0010_r50_fpn_1x.py"
model = dict(backbone=dict(dcn=dict(modulated=False),
                           stage_with_dcn=(False, True, True, True)))
