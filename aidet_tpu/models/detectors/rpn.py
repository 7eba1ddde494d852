"""Proposal-only RPN detector (parity: mmdet/models/detectors/rpn.py)."""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.anchors import build_pyramid_anchors
from ..builder import build_backbone, build_head, build_neck
from ..heads.anchor_head import (anchor_head_loss, flatten_level_outputs,
                                 rpn_proposals)
from ..losses import CrossEntropyLoss, SmoothL1Loss
from ..registry import DETECTORS


@DETECTORS.register
class RPN(nn.Module):
    backbone: Any = None
    neck: Any = None
    rpn_head: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    img_size: int = 1024
    strides: Sequence[int] = (4, 8, 16, 32, 64)
    anchor_scales: Sequence[int] = (8,)
    anchor_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    dtype: Any = jnp.float32

    def setup(self):
        self._backbone = build_backbone(self.backbone or dict(
            type="ResNet", depth=50, dtype=self.dtype))
        self._neck = build_neck(self.neck or dict(
            type="FPN", num_outs=5, dtype=self.dtype))
        self._rpn = build_head(self.rpn_head or dict(
            type="RPNHead", num_anchors=len(self.anchor_scales)
            * len(self.anchor_ratios), dtype=self.dtype))
        anchors, sizes = build_pyramid_anchors(
            self.img_size, self.strides,
            scales=self.anchor_scales, ratios=self.anchor_ratios)
        self._anchors = anchors
        self._level_sizes = sizes
        tc = dict(pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3,
                  num_samples=256, pos_fraction=0.5, neg_pos_ub=-1,
                  allowed_border=0, pos_weight=-1)
        tc.update(self.train_cfg or {})
        self._tc = tc
        ec = dict(nms_pre=2000, nms_post=2000, max_num=2000, nms_thr=0.7,
                  min_bbox_size=0)
        ec.update(self.test_cfg or {})
        self._ec = ec
        self._cls_loss = CrossEntropyLoss(use_sigmoid=True)
        self._bbox_loss = SmoothL1Loss(beta=1.0 / 9.0)

    def __call__(self, imgs):
        feats = self._neck(self._backbone(imgs))
        return self._rpn(feats)

    def loss(self, imgs, gt_boxes, gt_valid, img_shapes):
        cls_out, reg_out = self(imgs)
        cls_flat, reg_flat = flatten_level_outputs(
            cls_out, reg_out, self._rpn.cls_out_channels)
        key = self.make_rng("sampling")
        tc = self._tc
        out = anchor_head_loss(
            cls_flat, reg_flat, self._anchors,
            gt_boxes, gt_valid, img_shapes, key,
            cls_loss=self._cls_loss, bbox_loss=self._bbox_loss,
            assigner_cfg=dict(pos_iou_thr=tc["pos_iou_thr"],
                              neg_iou_thr=tc["neg_iou_thr"],
                              min_pos_iou=tc["min_pos_iou"]),
            sampler_cfg=dict(num_samples=tc["num_samples"],
                             pos_fraction=tc["pos_fraction"],
                             neg_pos_ub=tc["neg_pos_ub"]),
            allowed_border=tc["allowed_border"],
            pos_weight=tc["pos_weight"], use_sigmoid_cls=True)
        return dict(loss_rpn_cls=out["loss_cls"],
                    loss_rpn_bbox=out["loss_bbox"])

    def predict(self, imgs, img_shapes):
        cls_out, reg_out = self(imgs)
        cls_flat, reg_flat = flatten_level_outputs(
            cls_out, reg_out, self._rpn.cls_out_channels)
        boxes, scores, valid = rpn_proposals(
            cls_flat, reg_flat, self._anchors, self._level_sizes,
            img_shapes, **self._ec)
        return dict(boxes=boxes, scores=scores, valid=valid)
