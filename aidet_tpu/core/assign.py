"""Label assignment — vectorized MaxIoU assignment over padded gt sets.

TPU-native equivalent of the reference's per-image MaxIoUAssigner
(mmdet/core/bbox/assigners/max_iou_assigner.py): no Python branching on
gt counts; invalid (padding) gts are masked with IoU = -1 so they can
never be assigned.  Batch via jax.vmap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .boxes import bbox_overlaps


class AssignResult(NamedTuple):
    gt_inds: jax.Array       # [N] int32: -1 ignore, 0 negative, k>0 → gt k-1
    max_overlaps: jax.Array  # [N] best IoU with any valid gt
    labels: jax.Array        # [N] int32 class of assigned gt (0 if none)


def max_iou_assign(boxes: jax.Array, gt_boxes: jax.Array,
                   gt_valid: jax.Array,
                   gt_labels: jax.Array | None = None,
                   pos_iou_thr: float = 0.7,
                   neg_iou_thr=0.3,
                   min_pos_iou: float = 0.0,
                   gt_max_assign_all: bool = True,
                   box_valid: jax.Array | None = None,
                   ignore_boxes: jax.Array | None = None,
                   ignore_valid: jax.Array | None = None,
                   ignore_iof_thr: float = -1.0) -> AssignResult:
    """Assign each box to a gt (or background/ignore).

    Parity with MaxIoUAssigner.assign_wrt_overlaps
    (max_iou_assigner.py:121-199), reformulated branchlessly:

      1. default -1 (ignore)
      2. max IoU < neg_iou_thr (scalar or (lo, hi) range) → 0
      3. max IoU ≥ pos_iou_thr → that gt
      4. for each gt, its best-overlap boxes (IoU ≥ min_pos_iou) → that
         gt; later gts overwrite earlier (the reference's loop order),
         reproduced via a max over gt index.

    Args:
      boxes: [N, 4] padded candidates.
      gt_boxes: [G, 4] padded gt.
      gt_valid: [G] bool.
      box_valid: [N] bool — invalid boxes always get -1.
    """
    import os
    n = boxes.shape[0]
    if os.environ.get("AIDET_ASSIGN_BF16", "0") == "1":
        # halve the [G, N] IoU matrix bandwidth (round-4 profile: the
        # full-anchor f32 matrix dominates `rpn targets+loss`).  bf16
        # IoU has ~3 decimal digits — enough for the 0.3/0.5/0.7
        # threshold tests; borderline anchors may flip, which training
        # absorbs (sampling is random anyway).  Opt-in until the A/B
        # proves the step-time win justifies the numerics change.
        # IoU arithmetic stays f32 INSIDE the producer fusion (bf16
        # coordinates would round ±1-2 px at scene scale and corrupt
        # small overlaps); only the materialized [G, N] matrix and the
        # reduction passes over it are bf16 — that is where the bytes
        # are.  Final rounding is one bf16 ulp (~0.4% of the IoU).
        overlaps = bbox_overlaps(gt_boxes, boxes).astype(jnp.bfloat16)
        # stays bf16 through the masks/reductions below (weak-typed
        # python scalars don't promote); only the returned per-anchor
        # max upcasts
    else:
        overlaps = bbox_overlaps(gt_boxes, boxes)       # [G, N]
    # padding gts act like "no gt" (IoU 0 → background), NOT like
    # ignore regions (-1) — matches assign_wrt_overlaps:140-143 where
    # zero gts send every box to background
    overlaps = jnp.where(gt_valid[:, None], overlaps, 0.0)
    if box_valid is not None:
        overlaps = jnp.where(box_valid[None, :], overlaps, -1.0)
    if ignore_boxes is not None and ignore_iof_thr > 0:
        iof = bbox_overlaps(boxes, ignore_boxes, mode="iof")  # [N, I]
        if ignore_valid is not None:
            iof = jnp.where(ignore_valid[None, :], iof, -1.0)
        ignore_hit = iof.max(axis=-1) > ignore_iof_thr
        overlaps = jnp.where(ignore_hit[None, :], -1.0, overlaps)

    max_overlaps = overlaps.max(axis=0)                 # [N]
    argmax_overlaps = overlaps.argmax(axis=0)           # [N]

    assigned = jnp.full((n,), -1, jnp.int32)
    # step 2: negatives
    if isinstance(neg_iou_thr, (tuple, list)):
        lo, hi = neg_iou_thr
        is_neg = (max_overlaps >= lo) & (max_overlaps < hi)
    else:
        is_neg = (max_overlaps >= 0) & (max_overlaps < neg_iou_thr)
    assigned = jnp.where(is_neg, 0, assigned)
    # step 3: positives by threshold
    is_pos = max_overlaps >= pos_iou_thr
    assigned = jnp.where(is_pos, argmax_overlaps.astype(jnp.int32) + 1,
                         assigned)
    # step 4: each gt claims its best boxes; later gt index wins
    gt_max = overlaps.max(axis=1, keepdims=True)        # [G, 1]
    claim = (overlaps == gt_max) & (gt_max >= min_pos_iou) \
        & gt_valid[:, None]
    if not gt_max_assign_all:
        best_box = overlaps.argmax(axis=1)
        only_best = jnp.zeros_like(claim).at[
            jnp.arange(claim.shape[0]), best_box].set(True)
        claim &= only_best
    gt_ids = jnp.arange(1, claim.shape[0] + 1, dtype=jnp.int32)[:, None]
    claimed = (claim * gt_ids).max(axis=0)              # [N], 0 if unclaimed
    assigned = jnp.where(claimed > 0, claimed, assigned)

    if box_valid is not None:
        assigned = jnp.where(box_valid, assigned, -1)

    if gt_labels is None:
        labels = jnp.where(assigned > 0, 1, 0).astype(jnp.int32)
    else:
        safe = jnp.clip(assigned - 1, 0, gt_boxes.shape[0] - 1)
        labels = jnp.where(assigned > 0, gt_labels[safe], 0).astype(jnp.int32)
    return AssignResult(
        assigned,
        jnp.maximum(max_overlaps, 0.0).astype(jnp.float32), labels)


def point_assign(points: jax.Array, point_strides: jax.Array,
                 gt_boxes: jax.Array, gt_valid: jax.Array,
                 gt_labels: jax.Array | None = None,
                 scale: float = 4.0, pos_num: int = 1) -> AssignResult:
    """Assign points to gts by scale-matched center distance.

    Parity: mmdet/core/bbox/assigners/point_assigner.py: a gt is
    matched to the pyramid level whose stride bracket contains its
    log2 scale; within that level the ``pos_num`` closest points to
    the gt center become positives (closest gt wins ties).

    Args:
      points: [P, 2]; point_strides: [P] the stride of each point's
        level; gt_boxes: [G, 4]; gt_valid: [G].
    """
    num_gt = gt_boxes.shape[0]
    gw = gt_boxes[:, 2] - gt_boxes[:, 0]
    gh = gt_boxes[:, 3] - gt_boxes[:, 1]
    gt_scale = jnp.sqrt(jnp.maximum(gw * gh, 1e-6))
    pt_lvl = jnp.log2(point_strides)
    # clamp the gt level into the pyramid's bracket (PointAssigner
    # clamps gt_bboxes_lvl to [lvl_min, lvl_max]) — otherwise gts
    # smaller than the finest stride or larger than the coarsest get
    # ZERO positive points and silently drop out of the loss
    gt_lvl = jnp.clip(jnp.floor(jnp.log2(gt_scale / scale + 1e-6)),
                      pt_lvl.min(), pt_lvl.max())

    cx = (gt_boxes[:, 0] + gt_boxes[:, 2]) / 2
    cy = (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2
    dist = jnp.sqrt((points[None, :, 0] - cx[:, None]) ** 2
                    + (points[None, :, 1] - cy[:, None]) ** 2)  # [G, P]
    lvl_match = jnp.abs(pt_lvl[None, :] - gt_lvl[:, None]) < 0.5
    dist = jnp.where(lvl_match & gt_valid[:, None], dist, 1e10)

    # the pos_num closest points per gt claim it; if a point is
    # claimed by several gts, the CLOSEST gt wins
    _, close_idx = jax.lax.top_k(-dist, pos_num)              # [G, n]
    claim = jnp.zeros(dist.shape, bool).at[
        jnp.arange(num_gt)[:, None], close_idx].set(True)
    claim &= dist < 1e9
    claimed_dist = jnp.where(claim, dist, 1e10)
    best_gt = claimed_dist.argmin(0)                           # [P]
    has = claimed_dist.min(0) < 1e9
    assigned = jnp.where(has, best_gt.astype(jnp.int32) + 1, 0)
    if gt_labels is None:
        labels = (assigned > 0).astype(jnp.int32)
    else:
        safe = jnp.clip(assigned - 1, 0, num_gt - 1)
        labels = jnp.where(assigned > 0, gt_labels[safe],
                           0).astype(jnp.int32)
    return AssignResult(assigned, jnp.zeros(points.shape[0]), labels)


def approx_max_iou_assign(approxs: jax.Array, gt_boxes: jax.Array,
                          gt_valid: jax.Array,
                          gt_labels: jax.Array | None = None,
                          box_valid: jax.Array | None = None,
                          **assign_kwargs) -> AssignResult:
    """Assign gts to GROUPS of approx anchors by the group-max IoU.

    Parity: ApproxMaxIoUAssigner.assign
    (mmdet/core/bbox/assigners/approx_max_iou_assigner.py:52-150): each
    square (guided-anchoring base location) is represented by
    ``approxs_per_octave`` approx anchors; the assignment quality of
    the group is the MAX IoU any of its approxs reaches with the gt.
    The thresholding/claiming steps then mirror MaxIoUAssigner.

    Args:
      approxs: [N, per_octave, 4] approx anchors per square.
      gt_boxes: [G, 4]; gt_valid: [G]; box_valid: [N].
    Returns an AssignResult over the N squares.
    """
    n, per = approxs.shape[:2]
    all_iou = bbox_overlaps(gt_boxes, approxs.reshape(n * per, 4))
    group_iou = all_iou.reshape(-1, n, per).max(axis=2)     # [G, N]
    # feed the precomputed overlap matrix through the standard
    # branchless assignment by encoding it as fake boxes is wasteful —
    # instead replicate the assign_wrt_overlaps steps directly
    overlaps = jnp.where(gt_valid[:, None], group_iou, 0.0)
    if box_valid is not None:
        overlaps = jnp.where(box_valid[None, :], overlaps, -1.0)

    pos_iou_thr = assign_kwargs.get("pos_iou_thr", 0.7)
    neg_iou_thr = assign_kwargs.get("neg_iou_thr", 0.3)
    min_pos_iou = assign_kwargs.get("min_pos_iou", 0.0)
    gt_max_assign_all = assign_kwargs.get("gt_max_assign_all", True)

    max_overlaps = overlaps.max(axis=0)
    argmax_overlaps = overlaps.argmax(axis=0)
    assigned = jnp.full((n,), -1, jnp.int32)
    if isinstance(neg_iou_thr, (tuple, list)):
        lo, hi = neg_iou_thr
        is_neg = (max_overlaps >= lo) & (max_overlaps < hi)
    else:
        is_neg = (max_overlaps >= 0) & (max_overlaps < neg_iou_thr)
    assigned = jnp.where(is_neg, 0, assigned)
    is_pos = max_overlaps >= pos_iou_thr
    assigned = jnp.where(is_pos, argmax_overlaps.astype(jnp.int32) + 1,
                         assigned)
    gt_max = overlaps.max(axis=1, keepdims=True)
    claim = (overlaps == gt_max) & (gt_max >= min_pos_iou) \
        & gt_valid[:, None]
    if not gt_max_assign_all:
        best_box = overlaps.argmax(axis=1)
        claim &= jnp.zeros_like(claim).at[
            jnp.arange(claim.shape[0]), best_box].set(True)
    gt_ids = jnp.arange(1, claim.shape[0] + 1, dtype=jnp.int32)[:, None]
    claimed = (claim * gt_ids).max(axis=0)
    assigned = jnp.where(claimed > 0, claimed, assigned)
    if box_valid is not None:
        assigned = jnp.where(box_valid, assigned, -1)
    if gt_labels is None:
        labels = jnp.where(assigned > 0, 1, 0).astype(jnp.int32)
    else:
        safe = jnp.clip(assigned - 1, 0, gt_boxes.shape[0] - 1)
        labels = jnp.where(assigned > 0, gt_labels[safe],
                           0).astype(jnp.int32)
    return AssignResult(assigned, jnp.maximum(max_overlaps, 0.0), labels)
