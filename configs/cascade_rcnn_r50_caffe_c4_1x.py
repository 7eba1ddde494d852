# Cascade R-CNN on C4 features with the res5 shared head applied per
# stage (parity: reference configs/cascade_rcnn_r50_caffe_c4_1x.py).
_base_ = "cascade_rcnn_r50_fpn_1x.py"
model = dict(
    backbone=dict(_delete_=True, type="ResNet", depth=50, num_stages=3,
                  out_indices=(2,), frozen_stages=1, style="caffe"),
    neck=dict(_delete_=True, type="Identity"),
    shared_head=dict(type="ResLayer", depth=50, stage=3, stride=2,
                     style="caffe"),
    rpn_head=dict(_delete_=True, type="RPNHead", in_channels=1024,
                  feat_channels=1024, num_anchors=15),
    bbox_head=dict(_delete_=True, type="BBoxHead", with_avg_pool=True,
                   num_classes=81, in_channels=2048, roi_feat_size=7),
    strides=(16,),
    anchor_scales=(2, 4, 8, 16, 32),
)
