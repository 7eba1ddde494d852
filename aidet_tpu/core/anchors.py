"""Anchor generation + batched anchor targets.

TPU-native rework of the reference anchor machinery
(mmdet/core/anchor/anchor_generator.py, anchor_target.py): anchors for
a static input size are precomputed once as a single flat constant;
target assignment is one vmapped, branchless function over the padded
batch instead of per-image/per-level Python loops.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .assign import max_iou_assign
from .boxes import bbox2delta
from .sample import pseudo_sample_masks, random_sample_masks


class AnchorGenerator:
    """Grid anchors with mmdet-v1 semantics (rounded base anchors,
    ctr = (base-1)/2 — anchor_generator.py:29-56)."""

    def __init__(self, base_size, scales, ratios, scale_major=True,
                 ctr=None):
        self.base_size = base_size
        self.scales = np.asarray(scales, np.float32)
        self.ratios = np.asarray(ratios, np.float32)
        self.scale_major = scale_major
        self.ctr = ctr
        self.base_anchors = self._gen_base_anchors()

    @property
    def num_base_anchors(self):
        return self.base_anchors.shape[0]

    def _gen_base_anchors(self):
        w = h = self.base_size
        if self.ctr is None:
            x_ctr, y_ctr = 0.5 * (w - 1), 0.5 * (h - 1)
        else:
            x_ctr, y_ctr = self.ctr
        h_ratios = np.sqrt(self.ratios)
        w_ratios = 1.0 / h_ratios
        if self.scale_major:
            ws = (w * w_ratios[:, None] * self.scales[None, :]).reshape(-1)
            hs = (h * h_ratios[:, None] * self.scales[None, :]).reshape(-1)
        else:
            ws = (w * self.scales[:, None] * w_ratios[None, :]).reshape(-1)
            hs = (h * self.scales[:, None] * h_ratios[None, :]).reshape(-1)
        return np.round(np.stack([
            x_ctr - 0.5 * (ws - 1), y_ctr - 0.5 * (hs - 1),
            x_ctr + 0.5 * (ws - 1), y_ctr + 0.5 * (hs - 1)], -1))

    def grid_anchors(self, featmap_size, stride):
        """[feat_h*feat_w*A, 4] numpy anchors (row-major over the grid,
        A fastest — anchor_generator.py:66-83)."""
        fh, fw = featmap_size
        sx = np.arange(fw, dtype=np.float32) * stride
        sy = np.arange(fh, dtype=np.float32) * stride
        shift_x, shift_y = np.meshgrid(sx, sy)
        shifts = np.stack([shift_x, shift_y, shift_x, shift_y],
                          -1).reshape(-1, 4)
        all_anchors = (self.base_anchors[None, :, :]
                       + shifts[:, None, :]).reshape(-1, 4)
        return all_anchors.astype(np.float32)


def build_pyramid_anchors(img_size: int,
                          strides: Sequence[int],
                          base_sizes: Sequence[int] | None = None,
                          scales=(8,), ratios=(0.5, 1.0, 2.0)):
    """Flat anchors for all FPN levels of a fixed square input.

    Returns (anchors [A_total, 4] jnp, level_sizes list[int]).
    """
    base_sizes = base_sizes or strides
    anchors, sizes = [], []
    for stride, base in zip(strides, base_sizes):
        gen = AnchorGenerator(base, scales, ratios)
        fs = img_size // stride
        a = gen.grid_anchors((fs, fs), stride)
        anchors.append(a)
        sizes.append(a.shape[0])
    return jnp.asarray(np.concatenate(anchors, 0)), sizes


class AnchorTargets(NamedTuple):
    """Per-image anchor targets, batched [B, A, ...]."""
    labels: jax.Array         # [B, A] int32 (0 = bg, 1..C = fg class)
    label_weights: jax.Array  # [B, A]
    bbox_targets: jax.Array   # [B, A, 4]
    bbox_weights: jax.Array   # [B, A, 4]
    num_total_pos: jax.Array  # scalar
    num_total_neg: jax.Array  # scalar


def anchor_target(anchors: jax.Array,
                  gt_boxes: jax.Array, gt_valid: jax.Array,
                  img_shapes: jax.Array,
                  key: jax.Array,
                  gt_labels: jax.Array | None = None,
                  target_means=(0., 0., 0., 0.),
                  target_stds=(1., 1., 1., 1.),
                  allowed_border: float = 0.0,
                  pos_iou_thr: float = 0.7,
                  neg_iou_thr=0.3,
                  min_pos_iou: float = 0.3,
                  num_samples: int = 256,
                  pos_fraction: float = 0.5,
                  neg_pos_ub: float = -1.0,
                  pos_weight: float = -1.0,
                  sampling: bool = True,
                  gt_rboxes: jax.Array | None = None,
                  rbox_encode: str | None = None) -> AnchorTargets:
    """Batched anchor targets for RPN/RetinaNet-style heads.

    Parity: anchor_target / anchor_target_single
    (mmdet/core/anchor/anchor_target.py:7-160): inside-border filter,
    MaxIoU assignment, random (or pseudo) sampling, delta regression
    targets, pos/neg weighting, per-image `max(count, 1)` totals.

    Args:
      anchors: [A, 4] flat pyramid anchors (shared across batch).
      gt_boxes: [B, G, 4] padded; gt_valid: [B, G] bool.
      img_shapes: [B, 2] (h, w) of the un-padded image content.
      gt_labels: [B, G] int (1-based classes) or None (RPN binary).
      gt_rboxes/rbox_encode: rotated single-stage heads — assignment
        still runs on the gt HBBs, but regression targets become the
        rotated codec's deltas against the (axis-aligned) anchors
        (RBBOX_CODECS; rotated RetinaNet, BASELINE config #2).
        target_means/stds must then match the codec dim.
    """
    batch = gt_boxes.shape[0]
    keys = jax.random.split(key, batch)
    if rbox_encode is not None:
        from .rboxes import RBBOX_CODECS
        _, rbox_encode_fn, _, _ = RBBOX_CODECS[rbox_encode]
    else:
        rbox_encode_fn = None

    def single(gt, gtv, gtl, img_shape, k, gt_rb=None):
        if allowed_border >= 0:
            inside = ((anchors[:, 0] >= -allowed_border)
                      & (anchors[:, 1] >= -allowed_border)
                      & (anchors[:, 2] < img_shape[1] + allowed_border)
                      & (anchors[:, 3] < img_shape[0] + allowed_border))
        else:
            inside = jnp.ones(anchors.shape[0], bool)
        res = max_iou_assign(
            anchors, gt, gtv, gtl,
            pos_iou_thr=pos_iou_thr, neg_iou_thr=neg_iou_thr,
            min_pos_iou=min_pos_iou, box_valid=inside)
        if sampling:
            sm = random_sample_masks(k, res.gt_inds, num_samples,
                                     pos_fraction, neg_pos_ub)
        else:
            sm = pseudo_sample_masks(res.gt_inds)

        safe_gt = jnp.clip(res.gt_inds - 1, 0, gt.shape[0] - 1)
        if rbox_encode_fn is not None:
            deltas = rbox_encode_fn(anchors, gt_rb[safe_gt],
                                    target_means, target_stds)
        else:
            matched_gt = gt[safe_gt]
            deltas = bbox2delta(anchors, matched_gt, target_means,
                                target_stds)
        posf = sm.pos.astype(jnp.float32)
        bbox_targets = deltas * posf[:, None]
        bbox_weights = jnp.broadcast_to(posf[:, None], deltas.shape)
        labels = jnp.where(sm.pos, res.labels, 0)
        pw = 1.0 if pos_weight <= 0 else pos_weight
        label_weights = posf * pw + sm.neg.astype(jnp.float32)
        return (labels, label_weights, bbox_targets, bbox_weights,
                sm.num_pos, sm.num_neg)

    if gt_labels is None:
        gt_labels_in = jnp.zeros(gt_valid.shape, jnp.int32)
        use_labels = None
    else:
        gt_labels_in = gt_labels
        use_labels = True

    if rbox_encode_fn is not None:
        def wrapper(gt, gtv, gtl, shp, k, gt_rb):
            return single(gt, gtv, gtl if use_labels else None, shp, k,
                          gt_rb)
        out = jax.vmap(wrapper)(gt_boxes, gt_valid, gt_labels_in,
                                img_shapes, keys, gt_rboxes)
    else:
        def wrapper(gt, gtv, gtl, shp, k):
            return single(gt, gtv, gtl if use_labels else None, shp, k)

        out = jax.vmap(wrapper)(gt_boxes, gt_valid, gt_labels_in,
                                img_shapes, keys)
    labels, label_weights, bbox_targets, bbox_weights, npos, nneg = out
    # reference counts each image as ≥1 (anchor_target.py:66-67)
    num_total_pos = jnp.maximum(npos, 1).sum()
    num_total_neg = jnp.maximum(nneg, 1).sum()
    return AnchorTargets(labels, label_weights, bbox_targets, bbox_weights,
                         num_total_pos, num_total_neg)
