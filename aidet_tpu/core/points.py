"""Point generation + FCOS target assignment, fully batched.

TPU-native rework of mmdet/core/anchor/point_generator.py and the
FCOS target logic (mmdet/models/anchor_heads/fcos_head.py): points are
a static constant per (img_size, strides); per-pixel bbox/centerness
targets are computed branchlessly over the padded gt set.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

INF = 1e8


def build_pyramid_points(img_size: int, strides: Sequence[int]):
    """Flat [P, 2] (x, y) centers for all levels + per-level sizes +
    per-point stride + per-point regress range."""
    pts, sizes, pstrides = [], [], []
    for s in strides:
        fs = img_size // s
        xs = (np.arange(fs, dtype=np.float32) * s) + s // 2
        gx, gy = np.meshgrid(xs, xs)
        p = np.stack([gx.reshape(-1), gy.reshape(-1)], -1)
        pts.append(p)
        sizes.append(p.shape[0])
        pstrides.append(np.full(p.shape[0], s, np.float32))
    return (jnp.asarray(np.concatenate(pts)), sizes,
            jnp.asarray(np.concatenate(pstrides)))


def fcos_target(points: jax.Array, regress_ranges: jax.Array,
                gt_boxes: jax.Array, gt_valid: jax.Array,
                gt_labels: jax.Array, strides: jax.Array | None = None,
                center_sample_radius: float = 0.0):
    """Per-point FCOS targets for ONE image.

    Parity: FCOSHead.fcos_target_single (fcos_head.py): a point is
    positive iff it lies inside a gt box and its max regression
    distance falls in the level's regress range; ties resolved by
    minimal gt area; centerness = sqrt((min l,r / max l,r)·(min t,b /
    max t,b)).

    With ``strides`` + ``center_sample_radius`` > 0, positives are
    further restricted to points inside the gt's *center region*
    (center ± radius·stride, clipped to the box — the reference's
    FCOSHead.get_sample_region / center_sampling=True,
    configs/fcos/fcos_center_r50_caffe_fpn_gn_1x_4gpu.py.py).

    Args:
      points: [P, 2]; regress_ranges: [P, 2] (lo, hi) per point.
      gt_boxes: [G, 4]; gt_valid: [G]; gt_labels: [G] (1-based).
      strides: optional [P] per-point stride (required for center
        sampling).
    Returns (labels [P], bbox_targets [P, 4] (l, t, r, b),
             centerness [P]).
    """
    x = points[:, 0][:, None]                      # [P, 1]
    y = points[:, 1][:, None]
    l = x - gt_boxes[None, :, 0]                   # [P, G]
    t = y - gt_boxes[None, :, 1]
    r = gt_boxes[None, :, 2] - x
    b = gt_boxes[None, :, 3] - y
    ltrb = jnp.stack([l, t, r, b], axis=-1)        # [P, G, 4]

    inside = ltrb.min(-1) > 0                      # [P, G]
    if center_sample_radius > 0:
        assert strides is not None, \
            "center sampling needs per-point strides"
        cx = (gt_boxes[:, 0] + gt_boxes[:, 2]) * 0.5
        cy = (gt_boxes[:, 1] + gt_boxes[:, 3]) * 0.5
        rad = strides[:, None] * center_sample_radius      # [P, 1]
        cx1 = jnp.maximum(cx[None] - rad, gt_boxes[None, :, 0])
        cy1 = jnp.maximum(cy[None] - rad, gt_boxes[None, :, 1])
        cx2 = jnp.minimum(cx[None] + rad, gt_boxes[None, :, 2])
        cy2 = jnp.minimum(cy[None] + rad, gt_boxes[None, :, 3])
        inside = (inside & (x > cx1) & (x < cx2)
                  & (y > cy1) & (y < cy2))
    max_dist = ltrb.max(-1)
    in_range = ((max_dist >= regress_ranges[:, None, 0])
                & (max_dist <= regress_ranges[:, None, 1]))
    areas = ((gt_boxes[:, 2] - gt_boxes[:, 0] + 1)
             * (gt_boxes[:, 3] - gt_boxes[:, 1] + 1))[None, :]
    cand = inside & in_range & gt_valid[None, :]
    areas = jnp.where(cand, areas, INF)
    min_area = areas.min(-1)
    gt_idx = areas.argmin(-1)                      # [P]
    pos = min_area < INF

    safe = jnp.clip(gt_idx, 0, gt_boxes.shape[0] - 1)
    labels = jnp.where(pos, gt_labels[safe], 0).astype(jnp.int32)
    tgt = jnp.take_along_axis(
        ltrb, gt_idx[:, None, None], axis=1)[:, 0]  # [P, 4]
    lr = tgt[:, [0, 2]]
    tb = tgt[:, [1, 3]]
    centerness = jnp.sqrt(jnp.clip(
        (lr.min(-1) / jnp.maximum(lr.max(-1), 1e-6))
        * (tb.min(-1) / jnp.maximum(tb.max(-1), 1e-6)), 0.0, 1.0))
    return labels, tgt * pos[:, None], centerness * pos
