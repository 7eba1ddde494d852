"""ATSS head + detector (parity: mmdet/models/anchor_heads/atss_head.py
+ detectors/atss.py): RetinaNet towers + centerness branch, ATSS
assignment, GIoU box regression on decoded boxes."""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.anchors import build_pyramid_anchors
from ...core.atss import atss_assign
from ...core.boxes import bbox2delta, delta2bbox
from ...ops.nms import multiclass_nms
from ..builder import build_backbone, build_head, build_neck
from ..losses import CrossEntropyLoss, FocalLoss, GIoULoss
from ..registry import DETECTORS, HEADS


@HEADS.register
class ATSSHead(nn.Module):
    num_classes: int = 16
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    num_anchors: int = 1
    prior_prob: float = 0.01
    dtype: jnp.dtype = jnp.float32

    @property
    def cls_out_channels(self):
        return self.num_classes - 1

    @nn.compact
    def __call__(self, feats):
        cls_tower = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             dtype=self.dtype, name=f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        reg_tower = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             dtype=self.dtype, name=f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        bias_init = nn.initializers.constant(
            -math.log((1 - self.prior_prob) / self.prior_prob))
        cls_head = nn.Conv(self.num_anchors * self.cls_out_channels,
                           (3, 3), padding=1, bias_init=bias_init,
                           dtype=self.dtype, name="atss_cls")
        reg_head = nn.Conv(self.num_anchors * 4, (3, 3), padding=1,
                           dtype=self.dtype, name="atss_reg")
        ctr_head = nn.Conv(self.num_anchors, (3, 3), padding=1,
                           dtype=self.dtype, name="atss_centerness")
        cls_out, reg_out, ctr_out = [], [], []
        for lvl, f in enumerate(feats):
            c = r = f
            for cc, rr in zip(cls_tower, reg_tower):
                c = nn.relu(cc(c))
                r = nn.relu(rr(r))
            scale = self.param(f"scale{lvl}", nn.initializers.ones, ())
            cls_out.append(cls_head(c))
            reg_out.append(reg_head(r) * scale)
            ctr_out.append(ctr_head(r))
        return cls_out, reg_out, ctr_out


@DETECTORS.register
class ATSS(nn.Module):
    backbone: Any = None
    neck: Any = None
    bbox_head: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    img_size: int = 1024
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    dtype: Any = jnp.float32

    def setup(self):
        self._backbone = build_backbone(self.backbone or dict(
            type="ResNet", depth=50, dtype=self.dtype))
        self._neck = build_neck(self.neck or dict(
            type="FPN", num_outs=5, start_level=1, add_extra_convs=True,
            extra_convs_on_inputs=False, dtype=self.dtype))
        self._head = build_head(self.bbox_head or dict(
            type="ATSSHead", num_classes=16, dtype=self.dtype))
        # one anchor per location, 8x the stride (atss convention)
        anchors, sizes = build_pyramid_anchors(
            self.img_size, self.strides,
            base_sizes=[8 * s for s in self.strides],
            scales=(1.0,), ratios=(1.0,))
        self._anchors = anchors
        self._level_sizes = sizes
        tc = dict(topk=9)
        tc.update(self.train_cfg or {})
        self._tc = tc
        ec = dict(nms_pre=1000, score_thr=0.05, nms_thr=0.6,
                  max_per_img=100)
        ec.update(self.test_cfg or {})
        self._ec = ec
        self._cls_loss = FocalLoss(gamma=2.0, alpha=0.25)
        self._reg_loss = GIoULoss(loss_weight=2.0)
        self._ctr_loss = CrossEntropyLoss(use_sigmoid=True)

    def extract_feat(self, imgs):
        return self._neck(self._backbone(imgs))

    def __call__(self, imgs):
        return self._head(self.extract_feat(imgs))

    def _flatten(self, outs):
        cls_out, reg_out, ctr_out = outs
        b = cls_out[0].shape[0]
        c = self._head.cls_out_channels
        return (jnp.concatenate([x.reshape(b, -1, c) for x in cls_out], 1),
                jnp.concatenate([x.reshape(b, -1, 4) for x in reg_out], 1),
                jnp.concatenate([x.reshape(b, -1) for x in ctr_out], 1))

    @staticmethod
    def _centerness_target(anchors, gts):
        """ATSS centerness: from anchor center to matched gt sides."""
        ax = (anchors[:, 0] + anchors[:, 2]) * 0.5
        ay = (anchors[:, 1] + anchors[:, 3]) * 0.5
        l = ax - gts[:, 0]
        t = ay - gts[:, 1]
        r = gts[:, 2] - ax
        b = gts[:, 3] - ay
        lr = jnp.stack([l, r], -1)
        tb = jnp.stack([t, b], -1)
        c = ((lr.min(-1) / jnp.maximum(lr.max(-1), 1e-6))
             * (tb.min(-1) / jnp.maximum(tb.max(-1), 1e-6)))
        return jnp.sqrt(jnp.clip(c, 0.0, 1.0))

    def loss(self, imgs, gt_boxes, gt_valid, gt_labels, img_shapes):
        cls_flat, reg_flat, ctr_flat = self._flatten(
            self._head(self.extract_feat(imgs)))

        def single(g, v, l):
            return atss_assign(self._anchors, self._level_sizes, g, v, l,
                               topk=self._tc["topk"])
        assigned, labels = jax.vmap(single)(gt_boxes, gt_valid, gt_labels)
        pos = assigned > 0                                     # [B, A]
        num_pos = jnp.maximum(pos.sum(), 1.0)

        loss_cls = self._cls_loss(cls_flat, labels, avg_factor=num_pos)

        safe = jnp.clip(assigned - 1, 0, gt_boxes.shape[1] - 1)
        matched = jnp.take_along_axis(gt_boxes, safe[..., None], axis=1)
        decoded = delta2bbox(
            jnp.broadcast_to(self._anchors, (imgs.shape[0],)
                             + self._anchors.shape).reshape(-1, 4),
            reg_flat.reshape(-1, 4),
            (0., 0., 0., 0.), (0.1, 0.1, 0.2, 0.2)).reshape(reg_flat.shape)
        ctr_tgt = jax.vmap(self._centerness_target,
                           in_axes=(None, 0))(self._anchors, matched)
        ctr_tgt = ctr_tgt * pos
        ctr_sum = jnp.maximum(ctr_tgt.sum(), 1e-6)
        loss_bbox = self._reg_loss(
            decoded.reshape(-1, 4), matched.reshape(-1, 4),
            weight=ctr_tgt.reshape(-1), avg_factor=ctr_sum)
        loss_ctr = self._ctr_loss(
            ctr_flat.reshape(-1, 1), ctr_tgt.reshape(-1, 1),
            weight=pos.reshape(-1, 1).astype(jnp.float32),
            avg_factor=num_pos)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    loss_centerness=loss_ctr)

    def predict(self, imgs, img_shapes, scale_factors=None):
        cls_flat, reg_flat, ctr_flat = self._flatten(
            self._head(self.extract_feat(imgs)))
        ec = self._ec

        def single(cls_s, reg_s, ctr_s, shape):
            scores_all = (jax.nn.sigmoid(cls_s)
                          * jax.nn.sigmoid(ctr_s)[:, None])
            lvl_boxes, lvl_scores = [], []
            start = 0
            for n_lvl in self._level_sizes:
                sl = slice(start, start + n_lvl)
                start += n_lvl
                s = scores_all[sl]
                k = min(ec["nms_pre"], n_lvl)
                _, top_i = jax.lax.top_k(s.max(-1), k)
                boxes = delta2bbox(self._anchors[sl][top_i],
                                   reg_s[sl][top_i], (0., 0., 0., 0.),
                                   (0.1, 0.1, 0.2, 0.2), max_shape=shape)
                lvl_boxes.append(boxes)
                lvl_scores.append(s[top_i])
            boxes = jnp.concatenate(lvl_boxes)
            scores = jnp.concatenate(lvl_scores)
            scores = jnp.concatenate(
                [jnp.zeros((scores.shape[0], 1), scores.dtype), scores],
                -1)
            return multiclass_nms(boxes, scores, ec["score_thr"],
                                  ec["nms_thr"], ec["max_per_img"])
        res = jax.vmap(single)(cls_flat, reg_flat, ctr_flat, img_shapes)
        boxes = res.boxes
        if scale_factors is not None:
            boxes = boxes / scale_factors[:, None, None]
        return dict(boxes=boxes, scores=res.scores, labels=res.labels,
                    valid=res.valid)
