"""Guided Anchoring head + GA-RetinaNet detector.

Parity target: mmdet/models/anchor_heads/guided_anchor_head.py:621 +
ga_retina_head.py and the GA target logic
(mmdet/core/anchor/guided_anchor_target.py): each location predicts
(1) an anchor-presence probability ("loc"), (2) an anchor shape
(dw, dh), and adapts its features with a deformable conv driven by the
predicted shape before classification/regression on the *guided*
anchors.  Location targets use the gt center-region scheme; shape
targets regress the matched gt's log-size.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.anchors import anchor_target
from ...core.boxes import delta2bbox
from ...core.points import build_pyramid_points
from ...ops.deform_conv import deform_conv2d
from ...ops.nms import multiclass_nms
from ..builder import build_backbone, build_head, build_neck
from ..losses import CrossEntropyLoss, FocalLoss, SmoothL1Loss
from ..registry import DETECTORS, HEADS


@HEADS.register
class GARetinaHead(nn.Module):
    num_classes: int = 16
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    deformable_groups: int = 1
    prior_prob: float = 0.01
    loc_filter_thr: float = 0.01
    dtype: jnp.dtype = jnp.float32

    @property
    def cls_out_channels(self):
        return self.num_classes - 1

    @nn.compact
    def __call__(self, feats, masked=False):
        """``masked=True`` (inference) evaluates the cls/reg heads
        through masked_conv2d gated by the loc prediction — parity with
        the reference's MaskedConv2d test path (guided_anchor_head.py:
        181-201).  On TPU the dense-conv-x-mask form IS the fast path
        (gather-based sparsity would force dynamic shapes); the zeroed
        logits are discarded downstream by the same loc filter the
        predict path already applies."""
        cls_tower = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             dtype=self.dtype, name=f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        reg_tower = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             dtype=self.dtype, name=f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        bias_init = nn.initializers.constant(
            -math.log((1 - self.prior_prob) / self.prior_prob))
        conv_loc = nn.Conv(1, (1, 1), bias_init=bias_init,
                           dtype=self.dtype, name="conv_loc")
        # near-zero shape predictions at init so the guided anchors
        # start at the base scale (reference normal_init std=0.01)
        conv_shape = nn.Conv(2, (1, 1), dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.01),
                             name="conv_shape")
        # feature adaption: shape pred → deform-conv offsets
        offset_conv = nn.Conv(2 * 9, (1, 1), use_bias=False,
                              kernel_init=nn.initializers.zeros,
                              dtype=self.dtype, name="adaption_offset")
        adapt_cls_w = self.param(
            "adapt_cls_kernel", nn.initializers.he_normal(),
            (3, 3, self.feat_channels, self.feat_channels))
        adapt_reg_w = self.param(
            "adapt_reg_kernel", nn.initializers.he_normal(),
            (3, 3, self.feat_channels, self.feat_channels))
        cls_head = nn.Conv(self.cls_out_channels, (3, 3), padding=1,
                           bias_init=bias_init, dtype=self.dtype,
                           name="ga_cls")
        reg_head = nn.Conv(4, (3, 3), padding=1, dtype=self.dtype,
                           name="ga_reg")

        loc_out, shape_out, cls_out, reg_out = [], [], [], []
        for f in feats:
            c = r = f
            for cc, rr in zip(cls_tower, reg_tower):
                c = nn.relu(cc(c))
                r = nn.relu(rr(r))
            loc = conv_loc(c)
            loc_out.append(loc)
            shape = conv_shape(r)
            shape_out.append(shape)
            off = offset_conv(jax.lax.stop_gradient(shape))

            def dcn(x, o, w):
                return jax.vmap(
                    lambda img, oo: deform_conv2d(img, oo, w))(x, o)
            ca = nn.relu(dcn(c, off, adapt_cls_w))
            ra = nn.relu(dcn(r, off, adapt_reg_w))
            cls = cls_head(ca)
            reg = reg_head(ra)
            if masked:
                # dense-conv x loc-mask == ops.grid_sample.masked_conv2d
                # (its TPU realisation) applied to the head convs
                m = (jax.nn.sigmoid(loc) > self.loc_filter_thr)
                m = m.astype(cls.dtype)
                cls = cls * m
                reg = reg * m
            cls_out.append(cls)
            reg_out.append(reg)
        return cls_out, shape_out, loc_out, reg_out


@HEADS.register
class GARPNHead(nn.Module):
    """Guided-anchoring RPN head (parity: mmdet/models/anchor_heads/
    ga_rpn_head.py): shared 3x3 conv, then location/shape predictions,
    shape-driven feature adaption, and 1-class sigmoid cls + 4-d reg
    on the guided anchors."""
    in_channels: int = 256
    feat_channels: int = 256
    prior_prob: float = 0.01
    loc_filter_thr: float = 0.01
    dtype: jnp.dtype = jnp.float32

    @property
    def cls_out_channels(self):
        return 1

    @nn.compact
    def __call__(self, feats, masked=False):
        """``masked=True`` mirrors the reference's MaskedConv2d test
        path (ga_rpn inference): cls/reg outputs are gated by the loc
        prediction; on TPU dense-conv-x-mask is masked_conv2d's fast
        realisation (sparse gather would break static shapes)."""
        rpn_conv = nn.Conv(self.feat_channels, (3, 3), padding=1,
                           dtype=self.dtype, name="rpn_conv")
        bias_init = nn.initializers.constant(
            -math.log((1 - self.prior_prob) / self.prior_prob))
        conv_loc = nn.Conv(1, (1, 1), bias_init=bias_init,
                           dtype=self.dtype, name="conv_loc")
        # near-zero shape predictions at init so the guided anchors
        # start at the base scale (reference normal_init std=0.01)
        conv_shape = nn.Conv(2, (1, 1), dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.01),
                             name="conv_shape")
        offset_conv = nn.Conv(2 * 9, (1, 1), use_bias=False,
                              kernel_init=nn.initializers.zeros,
                              dtype=self.dtype, name="adaption_offset")
        adapt_w = self.param(
            "adapt_kernel", nn.initializers.he_normal(),
            (3, 3, self.feat_channels, self.feat_channels))
        cls_head = nn.Conv(1, (1, 1), dtype=self.dtype, name="rpn_cls")
        reg_head = nn.Conv(4, (1, 1), dtype=self.dtype, name="rpn_reg")

        loc_out, shape_out, cls_out, reg_out = [], [], [], []
        for f in feats:
            x = nn.relu(rpn_conv(f))
            loc = conv_loc(x)
            loc_out.append(loc)
            shape = conv_shape(x)
            shape_out.append(shape)
            off = offset_conv(jax.lax.stop_gradient(shape))
            adapted = nn.relu(jax.vmap(
                lambda img, oo: deform_conv2d(img, oo, adapt_w))(x, off))
            cls = cls_head(adapted)
            reg = reg_head(adapted)
            if masked:
                m = (jax.nn.sigmoid(loc) > self.loc_filter_thr)
                m = m.astype(cls.dtype)
                cls = cls * m
                reg = reg * m
            cls_out.append(cls)
            reg_out.append(reg)
        return cls_out, shape_out, loc_out, reg_out


def ga_targets(points, pstrides, gt_boxes, gt_valid, gt_labels,
               center_ratio=0.2, ignore_ratio=0.5):
    """Location + shape targets for one image.

    Parity: ga_loc_target / ga_shape_target
    (core/anchor/guided_anchor_target.py): locations inside the
    center-ratio region of a gt (at its matched level) are positive;
    the ignore band gets weight 0; shape targets are the matched gt's
    log-size relative to the location's base scale.
    """
    x = points[:, 0][:, None]
    y = points[:, 1][:, None]
    cx = (gt_boxes[None, :, 0] + gt_boxes[None, :, 2]) / 2
    cy = (gt_boxes[None, :, 1] + gt_boxes[None, :, 3]) / 2
    w = gt_boxes[None, :, 2] - gt_boxes[None, :, 0]
    h = gt_boxes[None, :, 3] - gt_boxes[None, :, 1]

    # exact single-level assignment via log2 binning (ga_loc_target:
    # each gt maps to ONE level, nearest in log scale) — overlapping
    # [base/2, base*2) ranges would double-count boundary-scale gts
    # on two levels and train neighbours on conflicting targets
    scale = jnp.sqrt(jnp.maximum(w * h, 1e-6))
    min_stride = jnp.min(pstrides)
    gt_lvl = jnp.clip(
        jnp.floor(jnp.log2(scale[0] / (min_stride * 8.0)) + 0.5),
        0, jnp.log2(jnp.max(pstrides) / min_stride))        # [G]
    pt_lvl = jnp.log2(pstrides / min_stride)                # [P]
    lvl_match = pt_lvl[:, None] == gt_lvl[None, :]
    adj_match = jnp.abs(pt_lvl[:, None] - gt_lvl[None, :]) == 1

    def region(ratio):
        return ((jnp.abs(x - cx) <= 0.5 * ratio * w)
                & (jnp.abs(y - cy) <= 0.5 * ratio * h))

    center = region(center_ratio) & lvl_match & gt_valid[None]
    # ignore band: the matched level's ignore_ratio ring plus the SAME
    # region projected onto the adjacent levels (ga_loc_target writes
    # ignore maps to lvl±1)
    ignore = (region(ignore_ratio) & (lvl_match | adj_match)
              & gt_valid[None])

    loc_tgt = center.any(-1).astype(jnp.float32)
    loc_weight = jnp.where(ignore.any(-1) & ~center.any(-1), 0.0, 1.0)

    # shape target: smallest matching gt per positive location
    areas = jnp.where(center, w * h, 1e10)
    gt_idx = areas.argmin(-1)
    pos = loc_tgt > 0
    safe = jnp.clip(gt_idx, 0, gt_boxes.shape[0] - 1)
    tw = jnp.log(jnp.maximum(w[0, safe] / (pstrides * 8.0), 1e-6))
    th = jnp.log(jnp.maximum(h[0, safe] / (pstrides * 8.0), 1e-6))
    shape_tgt = jnp.stack([tw, th], -1) * pos[:, None]
    return loc_tgt, loc_weight, shape_tgt, pos


@DETECTORS.register
class GARetinaNet(nn.Module):
    backbone: Any = None
    neck: Any = None
    bbox_head: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    img_size: int = 1024
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    octave_base: float = 8.0
    target_stds: Sequence[float] = (0.1, 0.1, 0.2, 0.2)
    dtype: Any = jnp.float32

    def setup(self):
        self._backbone = build_backbone(self.backbone or dict(
            type="ResNet", depth=50, dtype=self.dtype))
        self._neck = build_neck(self.neck or dict(
            type="FPN", num_outs=5, start_level=1, add_extra_convs=True,
            dtype=self.dtype))
        self._head = build_head(self.bbox_head or dict(
            type="GARetinaHead", num_classes=16, dtype=self.dtype))
        pts, sizes, pstrides = build_pyramid_points(
            self.img_size, self.strides)
        self._points = pts
        self._level_sizes = sizes
        self._pstrides = pstrides
        ec = dict(nms_pre=1000, score_thr=0.05, nms_thr=0.5,
                  max_per_img=100, loc_filter_thr=0.01)
        ec.update(self.test_cfg or {})
        self._ec = ec
        self._cls_loss = FocalLoss(gamma=2.0, alpha=0.25)
        self._reg_loss = SmoothL1Loss(beta=0.04)
        self._loc_loss = FocalLoss(gamma=2.0, alpha=0.25)
        self._shape_loss = SmoothL1Loss(beta=0.2)

    def extract_feat(self, imgs):
        return self._neck(self._backbone(imgs))

    def __call__(self, imgs):
        return self._head(self.extract_feat(imgs))

    def _flatten(self, outs):
        cls_out, shape_out, loc_out, reg_out = outs
        b = cls_out[0].shape[0]
        c = self._head.cls_out_channels
        f = lambda xs, d: jnp.concatenate(
            [x.reshape(b, -1, d) for x in xs], 1)
        return (f(cls_out, c), f(shape_out, 2),
                f(loc_out, 1)[..., 0], f(reg_out, 4))

    def _guided_anchors(self, shape_flat):
        """points + predicted shapes → anchors [B, P, 4]."""
        base = self._pstrides * self.octave_base
        w = base[None, :] * jnp.exp(shape_flat[..., 0])
        h = base[None, :] * jnp.exp(shape_flat[..., 1])
        cx = self._points[None, :, 0]
        cy = self._points[None, :, 1]
        return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2,
                          cy + h / 2], -1)

    def loss(self, imgs, gt_boxes, gt_valid, gt_labels, img_shapes):
        cls_flat, shape_flat, loc_flat, reg_flat = self._flatten(
            self._head(self.extract_feat(imgs)))
        loc_tgt, loc_w, shape_tgt, pos = jax.vmap(
            lambda g, v, l: ga_targets(self._points, self._pstrides,
                                       g, v, l))(gt_boxes, gt_valid,
                                                 gt_labels)
        n_loc = jnp.maximum(loc_tgt.sum(), 1.0)
        loss_loc = self._loc_loss(
            loc_flat[..., None], loc_tgt.astype(jnp.int32),
            weight=loc_w[..., None], avg_factor=n_loc)
        loss_shape = self._shape_loss(
            shape_flat, shape_tgt,
            weight=jnp.broadcast_to(pos[..., None], shape_flat.shape)
            .astype(jnp.float32), avg_factor=jnp.maximum(pos.sum(), 1.0))

        # cls/reg on the guided anchors (detached geometry)
        anchors = jax.lax.stop_gradient(
            self._guided_anchors(shape_flat))
        key = self.make_rng("sampling")

        def single(cls_s, reg_s, anc, g, v, l, k):
            tg = anchor_target(
                anc, g[None], v[None], jnp.asarray([[1e4, 1e4]]), k,
                gt_labels=l[None], target_stds=tuple(self.target_stds),
                pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0,
                sampling=False, allowed_border=-1)
            num = tg.num_total_pos.astype(jnp.float32)
            lc = self._cls_loss(cls_s, tg.labels[0],
                                weight=tg.label_weights[0],
                                avg_factor=num)
            lb = self._reg_loss(reg_s, tg.bbox_targets[0],
                                weight=tg.bbox_weights[0],
                                avg_factor=num)
            return lc, lb

        keys = jax.random.split(key, imgs.shape[0])
        lc, lb = jax.vmap(single)(cls_flat, reg_flat, anchors, gt_boxes,
                                  gt_valid, gt_labels, keys)
        return dict(loss_cls=lc.mean(), loss_bbox=lb.mean(),
                    loss_shape=loss_shape, loss_loc=loss_loc)

    def predict(self, imgs, img_shapes, scale_factors=None):
        cls_flat, shape_flat, loc_flat, reg_flat = self._flatten(
            self._head(self.extract_feat(imgs), masked=True))
        anchors = self._guided_anchors(shape_flat)
        ec = self._ec
        loc_prob = jax.nn.sigmoid(loc_flat)

        def single(cls_s, reg_s, anc, loc_p, shape):
            scores_all = (jax.nn.sigmoid(cls_s)
                          * (loc_p > ec["loc_filter_thr"])[:, None])
            lvl_boxes, lvl_scores = [], []
            start = 0
            for n_lvl in self._level_sizes:
                sl = slice(start, start + n_lvl)
                start += n_lvl
                s = scores_all[sl]
                k = min(ec["nms_pre"], n_lvl)
                _, top_i = jax.lax.top_k(s.max(-1), k)
                boxes = delta2bbox(anc[sl][top_i], reg_s[sl][top_i],
                                   (0., 0., 0., 0.),
                                   tuple(self.target_stds),
                                   max_shape=shape)
                lvl_boxes.append(boxes)
                lvl_scores.append(s[top_i])
            b_cat = jnp.concatenate(lvl_boxes)
            s_cat = jnp.concatenate(lvl_scores)
            s_cat = jnp.concatenate(
                [jnp.zeros((s_cat.shape[0], 1), s_cat.dtype), s_cat], -1)
            return multiclass_nms(b_cat, s_cat, ec["score_thr"],
                                  ec["nms_thr"], ec["max_per_img"])
        res = jax.vmap(single)(cls_flat, reg_flat, anchors, loc_prob,
                               img_shapes)
        boxes = res.boxes
        if scale_factors is not None:
            boxes = boxes / scale_factors[:, None, None]
        return dict(boxes=boxes, scores=res.scores, labels=res.labels,
                    valid=res.valid)
