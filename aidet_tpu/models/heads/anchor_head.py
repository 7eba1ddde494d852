"""Anchor-based dense head: module + functional loss/decode paths.

TPU-native rework of the reference AnchorHead
(mmdet/models/anchor_heads/anchor_head.py:15-334): the conv tower is a
flax module emitting per-level maps; everything after — anchor
matching, loss, proposal generation, detection decode — is a pure
function over the *flattened, concatenated* level outputs with padded
shapes, so one jit program covers the whole head.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.anchors import anchor_target
from ...core.boxes import clip_boxes, delta2bbox
from ...ops.nms import NEG_INF, nms
from ..registry import HEADS


@HEADS.register
class AnchorHead(nn.Module):
    """Plain 1x1-conv anchor head (anchor_head.py:88-97)."""
    num_classes: int = 2          # includes background (reference style)
    in_channels: int = 256
    feat_channels: int = 256
    num_anchors: int = 3
    use_sigmoid_cls: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def cls_out_channels(self):
        return (self.num_classes - 1 if self.use_sigmoid_cls
                else self.num_classes)

    @nn.compact
    def __call__(self, feats):
        cls_conv = nn.Conv(self.num_anchors * self.cls_out_channels,
                           (1, 1), dtype=self.dtype, name="conv_cls")
        reg_conv = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                           name="conv_reg")
        return ([cls_conv(f) for f in feats],
                [reg_conv(f) for f in feats])


def flatten_level_outputs(cls_scores, bbox_preds, cls_channels: int,
                          box_dim: int = 4):
    """Per-level NHWC maps → ([B, A_total, C], [B, A_total, box_dim]).

    Anchor order matches AnchorGenerator.grid_anchors (row-major grid,
    anchors fastest), so the flattened axis aligns with the flat anchor
    constant from build_pyramid_anchors.
    """
    b = cls_scores[0].shape[0]
    cls_flat = jnp.concatenate(
        [c.reshape(b, -1, cls_channels) for c in cls_scores], axis=1)
    box_flat = jnp.concatenate(
        [p.reshape(b, -1, box_dim) for p in bbox_preds], axis=1)
    return cls_flat, box_flat


def anchor_head_loss(cls_flat, box_flat, anchors,
                     gt_boxes, gt_valid, img_shapes, key,
                     gt_labels=None,
                     target_means=(0., 0., 0., 0.),
                     target_stds=(1., 1., 1., 1.),
                     cls_loss=None, bbox_loss=None,
                     assigner_cfg=None, sampler_cfg=None,
                     allowed_border=0.0, pos_weight=-1.0,
                     sampling=True, use_sigmoid_cls=False,
                     gt_rboxes=None, rbox_encode=None):
    """Dense-head loss over flattened predictions.

    Parity: AnchorHead.loss (anchor_head.py:162-207) with the
    normalizer num_total_pos + num_total_neg (sampling) or
    num_total_pos (focal-style heads).  ``gt_rboxes``/``rbox_encode``
    switch the regression targets to a rotated codec (rotated
    RetinaNet); target_means/stds must then match the codec dim.
    """
    assigner_cfg = assigner_cfg or {}
    sampler_cfg = sampler_cfg or {}
    tg = anchor_target(
        anchors, gt_boxes, gt_valid, img_shapes, key,
        gt_labels=gt_labels, target_means=target_means,
        target_stds=target_stds, allowed_border=allowed_border,
        pos_weight=pos_weight, sampling=sampling,
        gt_rboxes=gt_rboxes, rbox_encode=rbox_encode,
        **assigner_cfg, **sampler_cfg)

    if sampling:
        num_total = (tg.num_total_pos + tg.num_total_neg).astype(jnp.float32)
    else:
        num_total = tg.num_total_pos.astype(jnp.float32)

    # sigmoid vs softmax channel handling lives inside the configured
    # cls_loss (CrossEntropyLoss.use_sigmoid / FocalLoss); the call is
    # identical for both
    loss_cls = cls_loss(cls_flat, tg.labels,
                        weight=tg.label_weights,
                        avg_factor=num_total)
    loss_bbox = bbox_loss(box_flat, tg.bbox_targets,
                          weight=tg.bbox_weights,
                          avg_factor=num_total)
    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)


def rpn_proposals(cls_flat, box_flat, anchors, level_sizes,
                  img_shapes,
                  nms_pre=2000, nms_post=2000, max_num=2000,
                  nms_thr=0.7, min_bbox_size=0.0,
                  target_means=(0., 0., 0., 0.),
                  target_stds=(1., 1., 1., 1.),
                  use_sigmoid_cls=True):
    """Batched fixed-shape proposal generation.

    Parity: RPNHead.get_bboxes_single (rpn_head.py:55-105): per level —
    top nms_pre by score, decode, clip, min-size filter, NMS, keep
    nms_post; then global top max_num across levels.  Variable-length
    index selects become validity masks; output is [B, max_num, 4] +
    scores + valid.

    ``anchors`` may be [P, 4] (static, shared across the batch) or
    [B, P, 4] (per-image guided anchors, GA-RPN).
    """
    k_list = [min(nms_pre, n) if nms_pre > 0 else n for n in level_sizes]
    k_max = max(k_list)

    def single(cls_s, box_p, img_shape, anchors=anchors):
        """Per-level top-k/decode; levels are PADDED to a common k_max
        and stacked so the per-level NMS batches as one [L, k_max]
        problem (one tile-fixpoint program instead of L sequential
        ones — measured ~1.7x faster at 5 levels x 2000 on v5e)."""
        if use_sigmoid_cls:
            scores_all = jax.nn.sigmoid(cls_s[..., 0])
        else:
            scores_all = jax.nn.softmax(cls_s, -1)[..., 1]
        lvl_boxes, lvl_scores, lvl_valid = [], [], []
        start = 0
        for n_lvl, k in zip(level_sizes, k_list):
            sl = slice(start, start + n_lvl)
            start += n_lvl
            s = scores_all[sl]
            if n_lvl > 4 * k:
                # TPU-optimized approximate top-k for the huge fine
                # levels (recall ~0.95+; candidates below the top-k
                # would be NMS'd or out-ranked anyway)
                top_s, top_i = jax.lax.approx_max_k(s, k)
            else:
                top_s, top_i = jax.lax.top_k(s, k)
            a = anchors[sl][top_i]
            d = box_p[sl][top_i]
            props = delta2bbox(a, d, target_means, target_stds,
                               max_shape=img_shape)
            valid = jnp.ones(k, bool)
            if min_bbox_size > 0:
                w = props[:, 2] - props[:, 0] + 1
                h = props[:, 3] - props[:, 1] + 1
                valid &= (w >= min_bbox_size) & (h >= min_bbox_size)
            if k < k_max:      # pad short levels (P6) to the common k
                pad = k_max - k
                props = jnp.concatenate(
                    [props, jnp.zeros((pad, 4), props.dtype)])
                top_s = jnp.concatenate(
                    [top_s, jnp.full((pad,), NEG_INF, top_s.dtype)])
                valid = jnp.concatenate([valid, jnp.zeros(pad, bool)])
            lvl_boxes.append(props)
            lvl_scores.append(top_s)
            lvl_valid.append(valid)
        return (jnp.stack(lvl_boxes), jnp.stack(lvl_scores),
                jnp.stack(lvl_valid))

    if anchors.ndim == 3:
        boxes_l, scores_l, valid_l = jax.vmap(single)(
            cls_flat, box_flat, img_shapes, anchors)
    else:
        boxes_l, scores_l, valid_l = jax.vmap(single)(
            cls_flat, box_flat, img_shapes)

    b, num_lvls = boxes_l.shape[:2]
    flat_boxes = boxes_l.reshape(b * num_lvls, k_max, 4)
    flat_scores = scores_l.reshape(b * num_lvls, k_max)
    flat_valid = valid_l.reshape(b * num_lvls, k_max)
    # top_k output is score-descending (padding last) → presorted NMS,
    # batched over every (image, level) pair at once
    keep = jax.vmap(
        lambda bx, sc, v: nms(bx, sc, nms_thr, v, presorted=True))(
        flat_boxes, flat_scores, flat_valid)
    kept_s = jnp.where(keep, flat_scores, NEG_INF)
    if nms_post > 0 and nms_post < k_max:
        # per-level cap: kept candidates are still in descending score
        # order, so rank-among-kept is a cumulative count
        rank = jnp.cumsum(keep.astype(jnp.int32), axis=-1) - 1
        keep &= rank < nms_post
        kept_s = jnp.where(keep, flat_scores, NEG_INF)

    all_scores = kept_s.reshape(b, num_lvls * k_max)
    all_boxes = boxes_l.reshape(b, num_lvls * k_max, 4)
    k_out = min(max_num, all_scores.shape[1])
    top_s, top_i = jax.lax.top_k(all_scores, k_out)
    out_boxes = jnp.take_along_axis(all_boxes, top_i[..., None], axis=1)
    out_valid = top_s > NEG_INF / 2
    return (jnp.where(out_valid[..., None], out_boxes, 0.0),
            jnp.where(out_valid, top_s, 0.0), out_valid)


def anchor_head_bboxes(cls_flat, box_flat, anchors, level_sizes,
                       img_shapes,
                       nms_pre=1000, score_thr=0.05, nms_thr=0.5,
                       max_per_img=100,
                       target_means=(0., 0., 0., 0.),
                       target_stds=(1., 1., 1., 1.),
                       use_sigmoid_cls=True,
                       rescale_factors=None, nms_kwargs=None):
    """Single-stage detection decode (RetinaNet-style).

    Parity: AnchorHead.get_bboxes/get_bboxes_single
    (anchor_head.py:209-334): per level top nms_pre by max class score,
    decode, then multiclass NMS over all levels.
    """
    from ...ops.nms import multiclass_nms

    def single(cls_s, box_p, img_shape):
        if use_sigmoid_cls:
            scores_all = jax.nn.sigmoid(cls_s)           # [A, C]
        else:
            scores_all = jax.nn.softmax(cls_s, -1)       # [A, C+1]
        lvl_boxes, lvl_scores = [], []
        start = 0
        for n_lvl in level_sizes:
            sl = slice(start, start + n_lvl)
            start += n_lvl
            s = scores_all[sl]
            k = min(nms_pre, n_lvl) if nms_pre > 0 else n_lvl
            # rank by the best FOREGROUND score: in the softmax
            # layout column 0 is background and would dominate
            # max(-1) (ref get_bboxes_single ranks scores[:, 1:])
            ranking = (s.max(-1) if use_sigmoid_cls
                       else s[:, 1:].max(-1))
            _, top_i = jax.lax.top_k(ranking, k)
            props = delta2bbox(anchors[sl][top_i], box_p[sl][top_i],
                               target_means, target_stds,
                               max_shape=img_shape)
            lvl_boxes.append(props)
            lvl_scores.append(s[top_i])
        boxes = jnp.concatenate(lvl_boxes)               # [K, 4]
        scores = jnp.concatenate(lvl_scores)             # [K, C(-1)]
        if use_sigmoid_cls:  # add a dummy background column at 0
            scores = jnp.concatenate(
                [jnp.zeros((scores.shape[0], 1), scores.dtype), scores], -1)
        nkw = dict(iou_thr=nms_thr)
        nkw.update(nms_kwargs or {})
        return multiclass_nms(boxes, scores, score_thr,
                              max_num=max_per_img, **nkw)

    res = jax.vmap(single)(cls_flat, box_flat, img_shapes)
    if rescale_factors is not None:
        res = res._replace(
            boxes=res.boxes / rescale_factors[:, None, None])
    return res


def anchor_head_rboxes(cls_flat, box_flat, anchors, level_sizes,
                       img_shapes, encode="thetaobb",
                       nms_pre=1000, score_thr=0.05, nms_thr=0.1,
                       max_per_img=100,
                       target_means=None, target_stds=None,
                       rescale_factors=None):
    """Rotated single-stage decode (rotated RetinaNet, BASELINE
    config #2): per level top ``nms_pre`` by max class score, decode
    the rotated codec against the axis-aligned anchors, then TRUE
    rotated multiclass NMS (polygon IoU — the suppression the
    reference delegated to external wwtool).

    Returns (res: NMSResult with quad boxes [B, K, 8],
             rboxes [B, K, D] the codec-native decode at the same
             keep decisions).
    """
    from ...core.rboxes import RBBOX_CODECS
    from ...ops.nms import multiclass_nms

    dim, _, decode_fn, to_quad = RBBOX_CODECS[encode]
    if target_means is None:
        target_means = (0.,) * dim
    if target_stds is None:
        target_stds = (1.,) * dim

    def single(cls_s, box_p, img_shape):
        scores_all = jax.nn.sigmoid(cls_s)               # [A, C]
        lvl_rboxes, lvl_scores = [], []
        start = 0
        for n_lvl in level_sizes:
            sl = slice(start, start + n_lvl)
            start += n_lvl
            s = scores_all[sl]
            k = min(nms_pre, n_lvl) if nms_pre > 0 else n_lvl
            ranking = s.max(-1)
            _, top_i = jax.lax.top_k(ranking, k)
            rb = decode_fn(anchors[sl][top_i], box_p[sl][top_i],
                           target_means, target_stds)
            lvl_rboxes.append(rb)
            lvl_scores.append(s[top_i])
        rboxes = jnp.concatenate(lvl_rboxes)             # [K, D]
        scores = jnp.concatenate(lvl_scores)             # [K, C-1]
        quads = to_quad(rboxes)                          # [K, 8]
        scores = jnp.concatenate(
            [jnp.zeros((scores.shape[0], 1), scores.dtype), scores], -1)
        res = multiclass_nms(quads, scores, score_thr, iou_thr=nms_thr,
                             max_num=max_per_img, box_dim=8)
        roi = jnp.clip(res.roi_idx, 0, rboxes.shape[0] - 1)
        out_rb = jnp.where(res.valid[:, None], rboxes[roi], 0.0)
        return res, out_rb

    res, rboxes = jax.vmap(single)(cls_flat, box_flat, img_shapes)
    if rescale_factors is not None:
        sf = rescale_factors
        res = res._replace(boxes=res.boxes / sf[:, None, None])
        if encode == "thetaobb":  # theta is scale-invariant
            rboxes = jnp.concatenate(
                [rboxes[..., :4] / sf[:, None, None], rboxes[..., 4:]],
                -1)
        else:  # pointobb / hobb coordinates all scale
            rboxes = rboxes / sf[:, None, None]
    return res, rboxes
