"""FoveaBox head + detector (parity: mmdet/models/anchor_heads/
fovea_head.py + detectors/fovea.py): anchor-free per-pixel
classification over shrunk "fovea" regions with log-space offset
regression."""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.points import build_pyramid_points
from ...ops.nms import multiclass_nms
from ..builder import build_backbone, build_head, build_neck
from ..losses import FocalLoss, SmoothL1Loss
from ..registry import DETECTORS, HEADS

FOVEA_SCALE_RANGES = ((1, 64), (32, 128), (64, 256), (128, 512),
                      (256, 2048))
INF = 1e8


@HEADS.register
class FoveaHead(nn.Module):
    num_classes: int = 16
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
                           name="fovea_cls")
        reg_head = nn.Conv(4, (3, 3), padding=1, dtype=self.dtype,
                           name="fovea_reg")
        cls_out, reg_out = [], []
        for f in feats:
            c = r = f
            for cc, rr in zip(cls_tower, reg_tower):
                c = nn.relu(cc(c))
                r = nn.relu(rr(r))
            cls_out.append(cls_head(c))
            reg_out.append(reg_head(r))
        return cls_out, reg_out


def fovea_target(points, pstrides, scale_ranges_per_point, gt_boxes,
                 gt_valid, gt_labels, sigma: float = 0.4):
    """Per-point Fovea targets for one image.

    A point is positive iff it falls in the sigma-shrunk fovea of a gt
    whose sqrt-area is in the level's scale range; regression is the
    log-ratio of the point→edge distances to the level stride.
    """
    x = points[:, 0][:, None]
    y = points[:, 1][:, None]
    gx1 = gt_boxes[None, :, 0]
    gy1 = gt_boxes[None, :, 1]
    gx2 = gt_boxes[None, :, 2]
    gy2 = gt_boxes[None, :, 3]
    cx = (gx1 + gx2) / 2
    cy = (gy1 + gy2) / 2
    w = gx2 - gx1
    h = gy2 - gy1
    # shrunk fovea
    fx1 = cx - 0.5 * sigma * w
    fx2 = cx + 0.5 * sigma * w
    fy1 = cy - 0.5 * sigma * h
    fy2 = cy + 0.5 * sigma * h
    inside = (x >= fx1) & (x <= fx2) & (y >= fy1) & (y <= fy2)

    scale = jnp.sqrt(jnp.maximum(w * h, 1e-6))          # [1, G]
    lo = scale_ranges_per_point[:, 0][:, None]
    hi = scale_ranges_per_point[:, 1][:, None]
    in_range = (scale >= lo) & (scale <= hi)

    areas = jnp.where(inside & in_range & gt_valid[None, :],
                      w * h, INF)
    gt_idx = areas.argmin(-1)
    pos = areas.min(-1) < INF
    safe = jnp.clip(gt_idx, 0, gt_boxes.shape[0] - 1)
    labels = jnp.where(pos, gt_labels[safe], 0).astype(jnp.int32)

    g = gt_boxes[safe]
    st = pstrides
    eps = 1e-6
    tx1 = jnp.log(jnp.maximum((points[:, 0] - g[:, 0]) / st, eps))
    ty1 = jnp.log(jnp.maximum((points[:, 1] - g[:, 1]) / st, eps))
    tx2 = jnp.log(jnp.maximum((g[:, 2] - points[:, 0]) / st, eps))
    ty2 = jnp.log(jnp.maximum((g[:, 3] - points[:, 1]) / st, eps))
    tgt = jnp.stack([tx1, ty1, tx2, ty2], -1) * pos[:, None]
    return labels, tgt, pos


@DETECTORS.register
class FOVEA(nn.Module):
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
            type="FoveaHead", num_classes=16, dtype=self.dtype))
        pts, sizes, pstrides = build_pyramid_points(
            self.img_size, self.strides)
        self._points = pts
        self._level_sizes = sizes
        self._pstrides = pstrides
        sr = []
        for sz, r in zip(sizes, FOVEA_SCALE_RANGES):
            sr.append(jnp.tile(jnp.asarray(r, jnp.float32)[None], (sz, 1)))
        self._scale_ranges = jnp.concatenate(sr)
        ec = dict(nms_pre=1000, score_thr=0.05, nms_thr=0.5,
                  max_per_img=100)
        ec.update(self.test_cfg or {})
        self._ec = ec
        self._cls_loss = FocalLoss(gamma=1.5, alpha=0.4)
        self._reg_loss = SmoothL1Loss(beta=0.11, loss_weight=0.75)

    def extract_feat(self, imgs):
        return self._neck(self._backbone(imgs))

    def __call__(self, imgs):
        return self._head(self.extract_feat(imgs))

    def _flatten(self, outs):
        cls_out, reg_out = outs
        b = cls_out[0].shape[0]
        c = self._head.cls_out_channels
        return (jnp.concatenate([x.reshape(b, -1, c) for x in cls_out], 1),
                jnp.concatenate([x.reshape(b, -1, 4) for x in reg_out], 1))

    def loss(self, imgs, gt_boxes, gt_valid, gt_labels, img_shapes):
        cls_flat, reg_flat = self._flatten(
            self._head(self.extract_feat(imgs)))
        labels, tgts, pos = jax.vmap(
            lambda g, v, l: fovea_target(self._points, self._pstrides,
                                         self._scale_ranges, g, v, l)
        )(gt_boxes, gt_valid, gt_labels)
        num_pos = jnp.maximum(pos.sum(), 1.0)
        loss_cls = self._cls_loss(cls_flat, labels, avg_factor=num_pos)
        loss_bbox = self._reg_loss(
            reg_flat, tgts,
            weight=jnp.broadcast_to(pos[..., None], tgts.shape)
            .astype(jnp.float32),
            avg_factor=num_pos * 4)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)

    def predict(self, imgs, img_shapes, scale_factors=None):
        cls_flat, reg_flat = self._flatten(
            self._head(self.extract_feat(imgs)))
        ec = self._ec

        def single(cls_s, reg_s, shape):
            scores_all = jax.nn.sigmoid(cls_s)
            lvl_boxes, lvl_scores = [], []
            start = 0
            for n_lvl, st in zip(self._level_sizes, self.strides):
                sl = slice(start, start + n_lvl)
                start += n_lvl
                s = scores_all[sl]
                k = min(ec["nms_pre"], n_lvl)
                _, top_i = jax.lax.top_k(s.max(-1), k)
                pts = self._points[sl][top_i]
                d = jnp.exp(reg_s[sl][top_i]) * st
                boxes = jnp.stack([
                    jnp.clip(pts[:, 0] - d[:, 0], 0, shape[1]),
                    jnp.clip(pts[:, 1] - d[:, 1], 0, shape[0]),
                    jnp.clip(pts[:, 0] + d[:, 2], 0, shape[1]),
                    jnp.clip(pts[:, 1] + d[:, 3], 0, shape[0])], -1)
                lvl_boxes.append(boxes)
                lvl_scores.append(s[top_i])
            boxes = jnp.concatenate(lvl_boxes)
            scores = jnp.concatenate(lvl_scores)
            scores = jnp.concatenate(
                [jnp.zeros((scores.shape[0], 1), scores.dtype), scores], -1)
            return multiclass_nms(boxes, scores, ec["score_thr"],
                                  ec["nms_thr"], ec["max_per_img"])
        res = jax.vmap(single)(cls_flat, reg_flat, img_shapes)
        boxes = res.boxes
        if scale_factors is not None:
            boxes = boxes / scale_factors[:, None, None]
        return dict(boxes=boxes, scores=res.scores, labels=res.labels,
                    valid=res.valid)
