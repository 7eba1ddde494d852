"""FCOS head + detector (parity: mmdet/models/anchor_heads/
fcos_head.py and detectors/fcos.py): anchor-free per-pixel
classification, distance regression with per-level learnable scales,
and a centerness branch."""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.boxes import distance2bbox
from ...core.points import build_pyramid_points, fcos_target
from ...ops.nms import multiclass_nms
from ..builder import build_backbone, build_head, build_neck
from ..losses import CrossEntropyLoss, FocalLoss, IoULoss
from ..registry import DETECTORS, HEADS

FCOS_REGRESS_RANGES = ((-1, 64), (64, 128), (128, 256), (256, 512),
                       (512, 1e8))


@HEADS.register
class FCOSHead(nn.Module):
    num_classes: int = 16          # includes background
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    prior_prob: float = 0.01
    dtype: jnp.dtype = jnp.float32

    @property
    def cls_out_channels(self):
        return self.num_classes - 1

    @nn.compact
    def __call__(self, feats):
        import math
        cls_tower = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             dtype=self.dtype, name=f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        reg_tower = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             dtype=self.dtype, name=f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        bias_init = nn.initializers.constant(
            -math.log((1 - self.prior_prob) / self.prior_prob))
        cls_head = nn.Conv(self.cls_out_channels, (3, 3), padding=1,
                           bias_init=bias_init, dtype=self.dtype,
                           name="fcos_cls")
        reg_head = nn.Conv(4, (3, 3), padding=1, dtype=self.dtype,
                           name="fcos_reg")
        ctr_head = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype,
                           name="fcos_centerness")

        cls_out, reg_out, ctr_out = [], [], []
        for lvl, f in enumerate(feats):
            c = r = f
            for conv_c, conv_r in zip(cls_tower, reg_tower):
                c = nn.relu(conv_c(c))
                r = nn.relu(conv_r(r))
            scale = self.param(f"scale{lvl}", nn.initializers.ones, ())
            cls_out.append(cls_head(c))
            reg_out.append(jnp.exp(reg_head(r) * scale))
            ctr_out.append(ctr_head(c))
        return cls_out, reg_out, ctr_out


@DETECTORS.register
class FCOS(nn.Module):
    backbone: Any = None
    neck: Any = None
    bbox_head: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    img_size: int = 1024
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    # center sampling (reference FCOSHead.center_sampling /
    # get_sample_region; the fcos_center config family)
    center_sampling: bool = False
    center_sample_radius: float = 1.5
    dtype: Any = jnp.float32

    def setup(self):
        self._backbone = build_backbone(self.backbone or dict(
            type="ResNet", depth=50, dtype=self.dtype))
        self._neck = build_neck(self.neck or dict(
            type="FPN", num_outs=5, start_level=1, add_extra_convs=True,
            extra_convs_on_inputs=False, relu_before_extra_convs=True,
            dtype=self.dtype))
        self._head = build_head(self.bbox_head or dict(
            type="FCOSHead", num_classes=16, dtype=self.dtype))
        pts, sizes, pstrides = build_pyramid_points(
            self.img_size, self.strides)
        self._points = pts
        self._level_sizes = sizes
        self._pstrides = pstrides
        rr = []
        for sz, r in zip(sizes, FCOS_REGRESS_RANGES):
            rr.append(jnp.tile(jnp.asarray(r, jnp.float32)[None], (sz, 1)))
        self._regress_ranges = jnp.concatenate(rr)
        ec = dict(nms_pre=1000, score_thr=0.05, nms_thr=0.5,
                  max_per_img=100)
        ec.update(self.test_cfg or {})
        self._ec = ec
        self._cls_loss = FocalLoss(gamma=2.0, alpha=0.25)
        self._iou_loss = IoULoss()
        self._ctr_loss = CrossEntropyLoss(use_sigmoid=True)

    def extract_feat(self, imgs):
        return self._neck(self._backbone(imgs))

    def __call__(self, imgs):
        return self._head(self.extract_feat(imgs))

    def _flatten(self, outs):
        cls_out, reg_out, ctr_out = outs
        b = cls_out[0].shape[0]
        c = self._head.cls_out_channels
        cls_flat = jnp.concatenate(
            [x.reshape(b, -1, c) for x in cls_out], 1)
        reg_flat = jnp.concatenate(
            [x.reshape(b, -1, 4) for x in reg_out], 1)
        ctr_flat = jnp.concatenate(
            [x.reshape(b, -1) for x in ctr_out], 1)
        return cls_flat, reg_flat, ctr_flat

    def loss(self, imgs, gt_boxes, gt_valid, gt_labels, img_shapes):
        """Parity: FCOSHead.loss — focal cls over all points / num_pos,
        IoU loss on decoded boxes weighted by centerness targets, BCE
        on the centerness branch."""
        cls_flat, reg_flat, ctr_flat = self._flatten(
            self._head(self.extract_feat(imgs)))

        radius = (self.center_sample_radius if self.center_sampling
                  else 0.0)
        labels, tgts, ctr_tgts = jax.vmap(
            lambda g, v, l: fcos_target(self._points,
                                        self._regress_ranges, g, v, l,
                                        strides=self._pstrides,
                                        center_sample_radius=radius)
        )(gt_boxes, gt_valid, gt_labels)

        pos = labels > 0
        num_pos = jnp.maximum(pos.sum(), 1.0)
        loss_cls = self._cls_loss(cls_flat, labels, avg_factor=num_pos)

        decoded = distance2bbox(
            jnp.broadcast_to(self._points, (imgs.shape[0],)
                             + self._points.shape), reg_flat)
        target_boxes = distance2bbox(
            jnp.broadcast_to(self._points, (imgs.shape[0],)
                             + self._points.shape), tgts)
        ctr_sum = jnp.maximum(ctr_tgts.sum(), 1e-6)
        loss_bbox = self._iou_loss(
            decoded.reshape(-1, 4), target_boxes.reshape(-1, 4),
            weight=ctr_tgts.reshape(-1), avg_factor=ctr_sum)
        loss_ctr = self._ctr_loss(
            ctr_flat.reshape(-1, 1), ctr_tgts.reshape(-1, 1),
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
                boxes = distance2bbox(self._points[sl][top_i],
                                      reg_s[sl][top_i], max_shape=shape)
                lvl_boxes.append(boxes)
                lvl_scores.append(s[top_i])
            boxes = jnp.concatenate(lvl_boxes)
            scores = jnp.concatenate(lvl_scores)
            scores = jnp.concatenate(
                [jnp.zeros((scores.shape[0], 1), scores.dtype), scores], -1)
            return multiclass_nms(boxes, scores, ec["score_thr"],
                                  ec["nms_thr"], ec["max_per_img"])

        res = jax.vmap(single)(cls_flat, reg_flat, ctr_flat, img_shapes)
        boxes = res.boxes
        if scale_factors is not None:
            boxes = boxes / scale_factors[:, None, None]
        return dict(boxes=boxes, scores=res.scores, labels=res.labels,
                    valid=res.valid)
