"""Proposal-only RPN detectors (parity: mmdet/models/detectors/rpn.py).

Also hosts the guided-anchoring variant (reference
configs/guided_anchoring/ga_rpn_*.py): a GARPNHead predicts anchor
location/shape plus cls/reg on the guided anchors; proposals mask out
locations below the anchor-presence threshold.
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.anchors import anchor_target, build_pyramid_anchors
from ...core.points import build_pyramid_points
from ..builder import build_backbone, build_head, build_neck
from ..heads.anchor_head import (anchor_head_loss, flatten_level_outputs,
                                 rpn_proposals)
from ..heads.guided_anchor_head import ga_targets
from ..losses import CrossEntropyLoss, FocalLoss, SmoothL1Loss
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
    # GA-RPN knobs (ga_rpn_head.py; used when rpn_head is a GARPNHead)
    ga_target_stds: Sequence[float] = (0.07, 0.07, 0.14, 0.14)
    ga_loc_filter_thr: float = 0.01
    # on-device normalization for uint8 inputs (models/preprocess.py)
    img_norm: Any = None
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
        # accept both the flat form and the reference config shape
        # (train_cfg=dict(rpn=dict(...)), configs/rpn_r50_fpn_1x.py)
        tcfg = dict(self.train_cfg or {})
        tcfg.update(tcfg.pop("rpn", {}))
        tc.update(tcfg)
        self._tc = tc
        self._ga = (isinstance(self.rpn_head, Mapping)
                    and self.rpn_head.get("type") == "GARPNHead")
        if self._ga:
            pts, psizes, pstrides = build_pyramid_points(
                self.img_size, self.strides)
            self._ga_points = pts
            self._ga_level_sizes = psizes
            self._ga_pstrides = pstrides
            self._ga_loc_loss = FocalLoss(gamma=2.0, alpha=0.25)
            self._ga_shape_loss = SmoothL1Loss(beta=0.2)
        ec = dict(nms_pre=2000, nms_post=2000, max_num=2000, nms_thr=0.7,
                  min_bbox_size=0)
        ecfg = dict(self.test_cfg or {})
        ecfg.update(ecfg.pop("rpn", {}))
        ec.update(ecfg)
        self._ec = ec
        self._cls_loss = CrossEntropyLoss(use_sigmoid=True)
        self._bbox_loss = SmoothL1Loss(beta=1.0 / 9.0)


    def extract_feat(self, imgs):
        from ..preprocess import device_normalize
        imgs = device_normalize(imgs, self.img_norm, self.dtype)
        return self._neck(self._backbone(imgs))

    def __call__(self, imgs):
        feats = self.extract_feat(imgs)
        return self._rpn(feats)

    def _ga_outputs(self, feats, masked=False):
        """GA head outputs → (cls_flat, reg_flat, guided anchors,
        loc_keep, shape_flat, loc_flat); parity with
        TwoStageDetector._rpn_outputs's GA branch."""
        cls_out, shape_out, loc_out, reg_out = self._rpn(
            feats, masked=masked)
        b = cls_out[0].shape[0]
        f = lambda xs, d: jnp.concatenate(
            [x.reshape(b, -1, d) for x in xs], 1)
        cls_flat = f(cls_out, 1)
        shape_flat = f(shape_out, 2)
        loc_flat = f(loc_out, 1)[..., 0]
        reg_flat = f(reg_out, 4)
        base = self._ga_pstrides * 8.0
        w = base[None] * jnp.exp(shape_flat[..., 0])
        h = base[None] * jnp.exp(shape_flat[..., 1])
        cx = self._ga_points[None, :, 0]
        cy = self._ga_points[None, :, 1]
        anchors = jnp.stack(
            [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
        loc_keep = jax.nn.sigmoid(loc_flat) > self.ga_loc_filter_thr
        return cls_flat, reg_flat, anchors, loc_keep, shape_flat, loc_flat

    def _ga_loss(self, feats, gt_boxes, gt_valid, img_shapes, key):
        """GA-RPN losses (guided_anchor_head.py loss): location +
        shape losses, then cls/reg on the detached guided anchors."""
        (cls_flat, reg_flat, anchors, _loc_keep,
         shape_flat, loc_flat) = self._ga_outputs(feats)
        tc = self._tc
        loc_tgt, loc_w, shape_tgt, pos = jax.vmap(
            lambda g, v: ga_targets(
                self._ga_points, self._ga_pstrides, g, v, None))(
                    gt_boxes, gt_valid)
        losses = {}
        n_loc = jnp.maximum(loc_tgt.sum(), 1.0)
        losses["loss_rpn_loc"] = self._ga_loc_loss(
            loc_flat[..., None], loc_tgt.astype(jnp.int32),
            weight=loc_w[..., None], avg_factor=n_loc)
        losses["loss_rpn_shape"] = self._ga_shape_loss(
            shape_flat, shape_tgt,
            weight=jnp.broadcast_to(
                pos[..., None], shape_flat.shape).astype(jnp.float32),
            avg_factor=jnp.maximum(pos.sum(), 1.0))

        anchors_sg = jax.lax.stop_gradient(anchors)

        def ga_single(cls_s, reg_s, anc, g, v, shp, k):
            tg = anchor_target(
                anc, g[None], v[None], shp[None], k,
                target_stds=tuple(self.ga_target_stds),
                pos_iou_thr=tc["pos_iou_thr"],
                neg_iou_thr=tc["neg_iou_thr"],
                min_pos_iou=tc["min_pos_iou"],
                num_samples=tc["num_samples"],
                pos_fraction=tc["pos_fraction"],
                neg_pos_ub=tc["neg_pos_ub"],
                pos_weight=tc["pos_weight"],
                sampling=True, allowed_border=-1)
            num = (tg.num_total_pos
                   + tg.num_total_neg).astype(jnp.float32)
            lc = self._cls_loss(cls_s, tg.labels[0],
                                weight=tg.label_weights[0],
                                avg_factor=num)
            lb = self._bbox_loss(reg_s, tg.bbox_targets[0],
                                 weight=tg.bbox_weights[0],
                                 avg_factor=num)
            return lc, lb

        keys = jax.random.split(key, gt_boxes.shape[0])
        lc, lb = jax.vmap(ga_single)(
            cls_flat, reg_flat, anchors_sg, gt_boxes, gt_valid,
            img_shapes, keys)
        losses["loss_rpn_cls"] = lc.mean()
        losses["loss_rpn_bbox"] = lb.mean()
        return losses

    def loss(self, imgs, gt_boxes, gt_valid, img_shapes):
        key = self.make_rng("sampling")
        if self._ga:
            feats = self.extract_feat(imgs)
            return self._ga_loss(feats, gt_boxes, gt_valid,
                                 img_shapes, key)
        cls_out, reg_out = self(imgs)
        cls_flat, reg_flat = flatten_level_outputs(
            cls_out, reg_out, self._rpn.cls_out_channels)
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
        if self._ga:
            feats = self.extract_feat(imgs)
            (cls_flat, reg_flat, anchors, loc_keep,
             _sh, _lo) = self._ga_outputs(feats, masked=True)
            cls_props = jnp.where(loc_keep[..., None], cls_flat, -1e4)
            boxes, scores, valid = rpn_proposals(
                cls_props, reg_flat, anchors, self._ga_level_sizes,
                img_shapes, target_stds=tuple(self.ga_target_stds),
                **self._ec)
            return dict(boxes=boxes, scores=scores, valid=valid)
        cls_out, reg_out = self(imgs)
        cls_flat, reg_flat = flatten_level_outputs(
            cls_out, reg_out, self._rpn.cls_out_channels)
        boxes, scores, valid = rpn_proposals(
            cls_flat, reg_flat, self._anchors, self._level_sizes,
            img_shapes, **self._ec)
        return dict(boxes=boxes, scores=scores, valid=valid)
