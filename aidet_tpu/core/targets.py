"""Second-stage (RoI head) target computation over fixed-size samples.

TPU-native equivalents of bbox_target (mmdet/core/bbox/bbox_target.py),
rbbox_target (mmdet/core/rbbox/rbbox_target.py) and mask_target
(mmdet/core/mask/mask_target.py), restated over the fixed-length
:class:`~aidet_tpu.core.sample.FixedSample` representation — no
per-image concat loops, everything vmap-able.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .boxes import bbox2delta
from .rboxes import RBBOX_CODECS
from .sample import FixedSample


class RoiTargets(NamedTuple):
    labels: jax.Array         # [R] int32 (0 bg, 1..C fg)
    label_weights: jax.Array  # [R]
    bbox_targets: jax.Array   # [R, D]
    bbox_weights: jax.Array   # [R, D]


def bbox_target(sample: FixedSample, rois: jax.Array,
                gt_boxes: jax.Array, gt_labels: jax.Array,
                target_means=(0., 0., 0., 0.),
                target_stds=(0.1, 0.1, 0.2, 0.2),
                pos_weight: float = -1.0) -> RoiTargets:
    """Delta targets for the sampled rois of ONE image.

    Parity: bbox_target_single (mmdet/core/bbox/bbox_target.py:38-73).

    Args:
      sample: fixed-size sampling result (indices refer to the
        candidate set the rois were gathered from).
      rois: [R, 4] the sampled boxes themselves (already gathered).
      gt_boxes: [G, 4]; gt_labels: [G] 1-based classes.
    """
    g = gt_boxes.shape[0]
    safe_gt = jnp.clip(sample.gt_inds, 0, g - 1)
    matched = gt_boxes[safe_gt]
    deltas = bbox2delta(rois, matched, target_means, target_stds)
    posf = sample.is_pos.astype(jnp.float32)
    labels = jnp.where(sample.is_pos, gt_labels[safe_gt], 0)
    pw = 1.0 if pos_weight <= 0 else pos_weight
    label_weights = jnp.where(sample.is_pos, pw,
                              sample.valid.astype(jnp.float32))
    return RoiTargets(
        labels=labels.astype(jnp.int32),
        label_weights=label_weights,
        bbox_targets=deltas * posf[:, None],
        bbox_weights=jnp.broadcast_to(posf[:, None], deltas.shape))


def rbbox_target(sample: FixedSample, rois: jax.Array,
                 gt_rboxes: jax.Array, gt_labels: jax.Array,
                 encode: str = "thetaobb",
                 target_means=None, target_stds=None,
                 pos_weight: float = -1.0) -> RoiTargets:
    """Rotated-box delta targets, encode-dispatched.

    Parity: rbbox_target_single (mmdet/core/rbbox/rbbox_target.py:38-88)
    with the {thetaobb, pointobb, hobb} → codec dispatch at :47-49.

    Args:
      gt_rboxes: [G, D] in the chosen encoding (D = 5 or 8).
    """
    if encode == "rtheta":
        raise ValueError(
            "rbbox_target encodes against HBB rois; the 'rtheta' codec "
            "needs rotated proposals — use rtheta2delta directly in the "
            "rotated-RoI refinement branch")
    dim, encode_fn, _, _ = RBBOX_CODECS[encode]
    if target_means is None:
        target_means = (0.,) * dim
    if target_stds is None:
        target_stds = (1.,) * dim
    g = gt_rboxes.shape[0]
    safe_gt = jnp.clip(sample.gt_inds, 0, g - 1)
    matched = gt_rboxes[safe_gt]
    deltas = encode_fn(rois, matched, target_means, target_stds)
    posf = sample.is_pos.astype(jnp.float32)
    labels = jnp.where(sample.is_pos, gt_labels[safe_gt], 0)
    pw = 1.0 if pos_weight <= 0 else pos_weight
    label_weights = jnp.where(sample.is_pos, pw,
                              sample.valid.astype(jnp.float32))
    return RoiTargets(
        labels=labels.astype(jnp.int32),
        label_weights=label_weights,
        bbox_targets=deltas * posf[:, None],
        bbox_weights=jnp.broadcast_to(posf[:, None], deltas.shape))


def mask_target(sample: FixedSample, rois: jax.Array,
                gt_masks: jax.Array, mask_size: int = 28) -> jax.Array:
    """Crop+resize each positive roi's gt mask to ``mask_size``².

    Parity: mask_target_single (mmdet/core/mask/mask_target.py:16-41),
    with mmcv.imresize replaced by differentiable bilinear sampling so
    it also serves the CenterMap soft-target path (which regresses
    continuous pseudo-masks, datasets/pipelines/loading.py:160-178).

    Args:
      rois: [R, 4] sampled boxes; gt_masks: [G, H, W] float or bool.
    Returns [R, mask_size, mask_size] float32 crops (0 where not pos).
    """
    g = gt_masks.shape[0]
    safe_gt = jnp.clip(sample.gt_inds, 0, g - 1)
    masks = gt_masks[safe_gt].astype(jnp.float32)        # [R, H, W]

    x1, y1, x2, y2 = rois[:, 0], rois[:, 1], rois[:, 2], rois[:, 3]
    w = jnp.maximum(x2 - x1 + 1.0, 1.0)
    h = jnp.maximum(y2 - y1 + 1.0, 1.0)
    # sample centers of an SxS grid inside the roi (nearest-pixel
    # semantics of imresize(crop) ≈ bilinear at cell centers)
    grid = (jnp.arange(mask_size, dtype=jnp.float32) + 0.5) / mask_size
    ys = y1[:, None] + grid[None, :] * h[:, None] - 0.5   # [R, S]
    xs = x1[:, None] + grid[None, :] * w[:, None] - 0.5

    hh, ww = gt_masks.shape[-2], gt_masks.shape[-1]
    yy = jnp.clip(ys, 0, hh - 1)
    xx = jnp.clip(xs, 0, ww - 1)
    y0 = jnp.floor(yy).astype(jnp.int32)
    x0 = jnp.floor(xx).astype(jnp.int32)
    y1i = jnp.minimum(y0 + 1, hh - 1)
    x1i = jnp.minimum(x0 + 1, ww - 1)
    ly = yy - y0
    lx = xx - x0

    def bilin(m, y0_, y1_, ly_, x0_, x1_, lx_):
        top = m[y0_][:, x0_] * (1 - lx_) + m[y0_][:, x1_] * lx_
        bot = m[y1_][:, x0_] * (1 - lx_) + m[y1_][:, x1_] * lx_
        return top * (1 - ly_)[:, None] + bot * ly_[:, None]

    crops = jax.vmap(bilin)(masks, y0, y1i, ly, x0, x1i, lx)
    return crops * sample.is_pos[:, None, None]
