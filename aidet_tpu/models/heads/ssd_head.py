"""SSD head + detector (parity: mmdet/models/anchor_heads/ssd_head.py
+ the SSD300 config): per-level conv predictors, softmax CE with 3:1
loss-ranked hard-negative mining, smooth-L1 regression."""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchors import AnchorGenerator
from ...core.assign import max_iou_assign
from ...core.boxes import bbox2delta, delta2bbox
from ...core.sample import topk_mask_by_score
from ...ops.nms import multiclass_nms
from ..builder import build_backbone
from ..registry import DETECTORS, HEADS

# SSD300 geometry (ssd300 config + ssd_head anchor construction)
SSD300_FEAT_SIZES = (38, 19, 10, 5, 3, 1)
SSD300_STRIDES = (8, 16, 32, 64, 100, 300)
SSD300_RATIOS = ((2,), (2, 3), (2, 3), (2, 3), (2,), (2,))
SSD300_BASESIZE_RANGE = (0.15, 0.9)   # of input size


def build_ssd_anchors(input_size=300, feat_sizes=SSD300_FEAT_SIZES,
                      strides=SSD300_STRIDES, ratios_per_level=SSD300_RATIOS,
                      basesize_range=SSD300_BASESIZE_RANGE):
    """Flat SSD anchors + per-level counts.

    Mirrors SSDHead.__init__'s anchor construction: min/max sizes from
    the basesize range, scales [1, sqrt(max/min)], ratio set
    {1, r, 1/r}, keeping ratio-1 at both scales and the rest at scale 1.
    """
    min_ratio, max_ratio = basesize_range
    step = (max_ratio - min_ratio) / (len(feat_sizes) - 2)
    min_sizes = [input_size * 0.07] if input_size == 300 else \
        [input_size * 0.04]
    max_sizes = []
    r = min_ratio
    for _ in range(len(feat_sizes) - 1):
        min_sizes.append(round(input_size * r))
        max_sizes.append(round(input_size * (r + step)))
        r += step
    # keep max[k] == min[k+1] INCLUDING the last level's overhang
    # (SSD300's 315 ≈ input*(max_ratio + step)); truncating the last
    # max to input*max_ratio would make the top level's two scale
    # anchors identical (mn == mx → scale sqrt(mx/mn) == 1)
    max_sizes = [round(input_size * min_ratio)] + max_sizes

    anchors, sizes = [], []
    for k, fs in enumerate(feat_sizes):
        mn, mx = float(min_sizes[k]), float(max_sizes[k])
        scales = [1.0, math.sqrt(mx / mn)]
        ratios = [1.0]
        for rr in ratios_per_level[k]:
            ratios += [1.0 / rr, rr]
        stride = strides[k]
        gen = AnchorGenerator(mn, scales, ratios, scale_major=False,
                              ctr=((stride - 1) / 2.0, (stride - 1) / 2.0))
        # keep: ratio-1 at both scales, then other ratios at scale 1
        base = gen.base_anchors
        n_r = len(ratios)
        order = [0, n_r] + list(range(1, n_r))
        gen.base_anchors = base[order]
        a = gen.grid_anchors((fs, fs), stride)
        anchors.append(a)
        sizes.append(a.shape[0])
    return jnp.asarray(np.concatenate(anchors)), sizes


@HEADS.register
class SSDHead(nn.Module):
    num_classes: int = 21
    in_channels: Sequence[int] = (512, 1024, 512, 256, 256, 256)
    num_anchors: Sequence[int] = (4, 6, 6, 6, 4, 4)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        cls_out, reg_out = [], []
        for i, f in enumerate(feats):
            a = self.num_anchors[i]
            cls_out.append(nn.Conv(a * self.num_classes, (3, 3),
                                   padding=1, dtype=self.dtype,
                                   name=f"cls{i}")(f))
            reg_out.append(nn.Conv(a * 4, (3, 3), padding=1,
                                   dtype=self.dtype, name=f"reg{i}")(f))
        return cls_out, reg_out


@DETECTORS.register
class SSD(nn.Module):
    backbone: Any = None
    bbox_head: Any = None
    neck: Any = None              # SSD has no neck; kept for parity
    train_cfg: Any = None
    test_cfg: Any = None
    input_size: int = 300
    img_size: int = 300           # alias used by the shared APIs
    dtype: Any = jnp.float32

    def setup(self):
        self._backbone = build_backbone(self.backbone or dict(
            type="SSDVGG", input_size=self.input_size, dtype=self.dtype))
        from ..builder import build_head
        self._head = build_head(self.bbox_head or dict(
            type="SSDHead", num_classes=21, dtype=self.dtype))
        anchors, sizes = build_ssd_anchors(self.input_size)
        self._anchors = anchors
        self._level_sizes = sizes
        tc = dict(pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.0,
                  neg_pos_ratio=3.0,
                  target_stds=(0.1, 0.1, 0.2, 0.2))
        tc.update(self.train_cfg or {})
        self._tc = tc
        ec = dict(nms_pre=1000, score_thr=0.02, nms_thr=0.45,
                  max_per_img=200,
                  target_stds=(0.1, 0.1, 0.2, 0.2))
        ec.update(self.test_cfg or {})
        self._ec = ec

    def __call__(self, imgs):
        return self._head(self._backbone(imgs))

    def _flatten(self, outs):
        cls_out, reg_out = outs
        b = cls_out[0].shape[0]
        c = self._head.num_classes
        return (jnp.concatenate(
            [x.reshape(b, -1, c) for x in cls_out], 1),
            jnp.concatenate([x.reshape(b, -1, 4) for x in reg_out], 1))

    def loss(self, imgs, gt_boxes, gt_valid, gt_labels, img_shapes):
        """SSDHead.loss parity: CE over positives plus the top
        3x-negatives by loss (hard mining), smooth-L1 on positives."""
        tc = self._tc
        cls_flat, reg_flat = self._flatten(self(imgs))

        def single(cls_s, reg_s, g, v, l):
            res = max_iou_assign(
                self._anchors, g, v, l,
                pos_iou_thr=tc["pos_iou_thr"],
                neg_iou_thr=tc["neg_iou_thr"],
                min_pos_iou=tc["min_pos_iou"],
                gt_max_assign_all=False)
            pos = res.gt_inds > 0
            neg = res.gt_inds == 0
            labels = jnp.where(pos, res.labels, 0)
            logp = jax.nn.log_softmax(cls_s, -1)
            ce = -jnp.take_along_axis(logp, labels[:, None], -1)[:, 0]
            num_pos = pos.sum()
            k_neg = (tc["neg_pos_ratio"]
                     * jnp.maximum(num_pos, 1)).astype(jnp.int32)
            hard_neg = topk_mask_by_score(neg, ce, k_neg)
            denom = jnp.maximum(num_pos, 1).astype(jnp.float32)
            loss_cls = (ce * (pos | hard_neg)).sum() / denom

            safe = jnp.clip(res.gt_inds - 1, 0, g.shape[0] - 1)
            deltas = bbox2delta(self._anchors, g[safe],
                                (0., 0., 0., 0.), tc["target_stds"])
            diff = jnp.abs(reg_s - deltas)
            sl1 = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)
            loss_bbox = (sl1.sum(-1) * pos).sum() / denom
            return loss_cls, loss_bbox

        lc, lb = jax.vmap(single)(cls_flat, reg_flat, gt_boxes, gt_valid,
                                  gt_labels)
        return dict(loss_cls=lc.mean(), loss_bbox=lb.mean())

    def predict(self, imgs, img_shapes, scale_factors=None):
        ec = self._ec
        cls_flat, reg_flat = self._flatten(self(imgs))

        def single(cls_s, reg_s, shape):
            scores = jax.nn.softmax(cls_s, -1)
            boxes = delta2bbox(self._anchors, reg_s, (0., 0., 0., 0.),
                               ec["target_stds"], max_shape=shape)
            return multiclass_nms(boxes, scores, ec["score_thr"],
                                  ec["nms_thr"], ec["max_per_img"])
        res = jax.vmap(single)(cls_flat, reg_flat, img_shapes)
        boxes = res.boxes
        if scale_factors is not None:
            boxes = boxes / scale_factors[:, None, None]
        return dict(boxes=boxes, scores=res.scores, labels=res.labels,
                    valid=res.valid)
