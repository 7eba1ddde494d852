"""ATSS assignment (parity: mmdet/core/bbox/assigners/atss_assigner.py):
per gt, the top-k closest anchors per level are candidates; the IoU
threshold adapts to mean+std of candidate IoUs; positives additionally
need their center inside the gt.  Vectorized over padded gts.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from .boxes import bbox_overlaps


def atss_assign(anchors: jax.Array, level_sizes: Sequence[int],
                gt_boxes: jax.Array, gt_valid: jax.Array,
                gt_labels: jax.Array | None = None,
                topk: int = 9):
    """Returns (assigned [A] int32: 0 bg / k>0 gt k-1, labels [A])."""
    num_gt = gt_boxes.shape[0]
    overlaps = bbox_overlaps(gt_boxes, anchors)            # [G, A]
    overlaps = jnp.where(gt_valid[:, None], overlaps, 0.0)

    ax = (anchors[:, 0] + anchors[:, 2]) * 0.5
    ay = (anchors[:, 1] + anchors[:, 3]) * 0.5
    gx = (gt_boxes[:, 0] + gt_boxes[:, 2]) * 0.5
    gy = (gt_boxes[:, 1] + gt_boxes[:, 3]) * 0.5
    dist = jnp.sqrt((ax[None] - gx[:, None]) ** 2
                    + (ay[None] - gy[:, None]) ** 2)       # [G, A]

    # per-level top-k closest anchors → candidate mask [G, A]
    cand = jnp.zeros_like(overlaps, bool)
    start = 0
    for n_lvl in level_sizes:
        d = dist[:, start:start + n_lvl]
        k = min(topk, n_lvl)
        _, idx = jax.lax.top_k(-d, k)                       # [G, k]
        lvl_mask = jnp.zeros((num_gt, n_lvl), bool)
        lvl_mask = lvl_mask.at[
            jnp.arange(num_gt)[:, None], idx].set(True)
        cand = cand.at[:, start:start + n_lvl].set(lvl_mask)
        start += n_lvl

    # adaptive threshold = mean + std of candidate IoUs per gt
    cnt = jnp.maximum(cand.sum(-1), 1)
    c_iou = jnp.where(cand, overlaps, 0.0)
    mean = c_iou.sum(-1) / cnt
    # Bessel-corrected (n-1), matching torch.std in ATSSAssigner
    var = (jnp.where(cand, (overlaps - mean[:, None]) ** 2, 0.0)
           .sum(-1) / jnp.maximum(cnt - 1, 1))
    thr = mean + jnp.sqrt(var)                              # [G]

    inside = ((ax[None] - gt_boxes[:, None, 0] > 0.01)
              & (ay[None] - gt_boxes[:, None, 1] > 0.01)
              & (gt_boxes[:, None, 2] - ax[None] > 0.01)
              & (gt_boxes[:, None, 3] - ay[None] > 0.01))
    pos = cand & (overlaps >= thr[:, None]) & inside \
        & gt_valid[:, None]                                 # [G, A]

    # an anchor claimed by several gts goes to the max-IoU one
    masked = jnp.where(pos, overlaps, -1.0)
    best_gt = masked.argmax(0)                              # [A]
    has_pos = masked.max(0) > -0.5
    assigned = jnp.where(has_pos, best_gt.astype(jnp.int32) + 1, 0)

    if gt_labels is None:
        labels = (assigned > 0).astype(jnp.int32)
    else:
        safe = jnp.clip(assigned - 1, 0, num_gt - 1)
        labels = jnp.where(assigned > 0, gt_labels[safe], 0)
    return assigned, labels.astype(jnp.int32)
