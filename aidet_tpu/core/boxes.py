"""Horizontal bounding-box (HBB) geometry, vectorized for TPU.

Behavioral parity with the reference's mmdet-v1 box math
(reference: mmdet/core/bbox/transforms.py, mmdet/core/bbox/geometry.py),
which uses the *legacy* "+1" pixel convention: a box [x1,y1,x2,y2] has
width x2-x1+1.  All functions here are pure jax.numpy, operate on
arbitrary leading batch dimensions, and are safe to call under jit.

Boxes are float arrays [..., 4] in (x1, y1, x2, y2) order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# mmdet-v1 legacy convention: +1 on widths/heights, ±0.5 on decode corners.
LEGACY_OFFSET = 1.0


def bbox_wh(boxes: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Width/height under the legacy +1 convention."""
    w = boxes[..., 2] - boxes[..., 0] + LEGACY_OFFSET
    h = boxes[..., 3] - boxes[..., 1] + LEGACY_OFFSET
    return w, h


def bbox_area(boxes: jax.Array) -> jax.Array:
    w, h = bbox_wh(boxes)
    return w * h


def bbox_center(boxes: jax.Array) -> tuple[jax.Array, jax.Array]:
    cx = (boxes[..., 0] + boxes[..., 2]) * 0.5
    cy = (boxes[..., 1] + boxes[..., 3]) * 0.5
    return cx, cy


def bbox2delta(proposals: jax.Array, gt: jax.Array,
               means=(0., 0., 0., 0.), stds=(1., 1., 1., 1.)) -> jax.Array:
    """Encode gt boxes as (dx, dy, dw, dh) deltas w.r.t. proposals.

    Parity: mmdet/core/bbox/transforms.py:6-31 (bbox2delta).
    """
    px, py = bbox_center(proposals)
    pw, ph = bbox_wh(proposals)
    gx, gy = bbox_center(gt)
    gw, gh = bbox_wh(gt)

    dx = (gx - px) / pw
    dy = (gy - py) / ph
    dw = jnp.log(gw / pw)
    dh = jnp.log(gh / ph)
    deltas = jnp.stack([dx, dy, dw, dh], axis=-1)

    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    return (deltas - means) / stds


def delta2bbox(rois: jax.Array, deltas: jax.Array,
               means=(0., 0., 0., 0.), stds=(1., 1., 1., 1.),
               max_shape=None, wh_ratio_clip=16.0 / 1000.0) -> jax.Array:
    """Decode (dx, dy, dw, dh) deltas onto rois.

    ``deltas`` may be [..., 4*K] (per-class regression); rois are
    broadcast across the K groups, matching the reference semantics
    (mmdet/core/bbox/transforms.py:34-112, delta2bbox).
    """
    k = deltas.shape[-1] // 4
    shape = deltas.shape
    d = deltas.reshape(shape[:-1] + (k, 4))

    means = jnp.asarray(means, d.dtype)
    stds = jnp.asarray(stds, d.dtype)
    d = d * stds + means

    dx, dy, dw, dh = d[..., 0], d[..., 1], d[..., 2], d[..., 3]
    max_ratio = jnp.abs(jnp.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)

    px, py = bbox_center(rois)
    pw, ph = bbox_wh(rois)
    px, py, pw, ph = (v[..., None] for v in (px, py, pw, ph))

    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gx = px + pw * dx
    gy = py + ph * dy

    half = 0.5 * LEGACY_OFFSET
    x1 = gx - gw * 0.5 + half
    y1 = gy - gh * 0.5 + half
    x2 = gx + gw * 0.5 - half
    y2 = gy + gh * 0.5 - half
    if max_shape is not None:
        x1 = jnp.clip(x1, 0, max_shape[1] - 1)
        y1 = jnp.clip(y1, 0, max_shape[0] - 1)
        x2 = jnp.clip(x2, 0, max_shape[1] - 1)
        y2 = jnp.clip(y2, 0, max_shape[0] - 1)
    return jnp.stack([x1, y1, x2, y2], axis=-1).reshape(shape)


def bbox_overlaps(boxes1: jax.Array, boxes2: jax.Array,
                  mode: str = "iou", aligned: bool = False) -> jax.Array:
    """Pairwise IoU / IoF between two box sets.

    Parity: mmdet/core/bbox/geometry.py:4-88 (bbox_overlaps),
    including the legacy +1 area convention.

    Args:
      boxes1: [..., N, 4]; boxes2: [..., M, 4].
      mode: 'iou' (intersection over union) or 'iof'
        (intersection over the area of boxes1).
      aligned: if True, N == M and overlap is computed elementwise,
        returning [..., N]; else returns [..., N, M].
    """
    assert mode in ("iou", "iof")
    if not aligned:
        boxes1 = boxes1[..., :, None, :]
        boxes2 = boxes2[..., None, :, :]
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt + LEGACY_OFFSET, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area1 = bbox_area(boxes1)
    if mode == "iou":
        union = area1 + bbox_area(boxes2) - inter
    else:
        union = area1
    return inter / jnp.maximum(union, jnp.finfo(inter.dtype).tiny)


def bbox_flip(boxes: jax.Array, img_shape) -> jax.Array:
    """Horizontal flip. Parity: mmdet/core/bbox/transforms.py:114-131."""
    w = img_shape[1]
    x1 = w - boxes[..., 2] - 1
    x2 = w - boxes[..., 0] - 1
    return jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], axis=-1)


def bbox_mapping(boxes, img_shape, scale_factor, flip):
    """Original-image scale → test scale (transforms.py:134-140)."""
    out = boxes * scale_factor
    if flip:
        out = bbox_flip(out, img_shape)
    return out


def bbox_mapping_back(boxes, img_shape, scale_factor, flip):
    """Test scale → original-image scale (transforms.py:143-147)."""
    out = bbox_flip(boxes, img_shape) if flip else boxes
    return out / scale_factor


def clip_boxes(boxes: jax.Array, img_shape) -> jax.Array:
    x1 = jnp.clip(boxes[..., 0], 0, img_shape[1] - 1)
    y1 = jnp.clip(boxes[..., 1], 0, img_shape[0] - 1)
    x2 = jnp.clip(boxes[..., 2], 0, img_shape[1] - 1)
    y2 = jnp.clip(boxes[..., 3], 0, img_shape[0] - 1)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def distance2bbox(points: jax.Array, distance: jax.Array, max_shape=None):
    """Decode (l, t, r, b) distances from points to a box.

    Parity: mmdet/core/bbox/transforms.py:202-222 (FCOS-family decode).
    """
    x1 = points[..., 0] - distance[..., 0]
    y1 = points[..., 1] - distance[..., 1]
    x2 = points[..., 0] + distance[..., 2]
    y2 = points[..., 1] + distance[..., 3]
    if max_shape is not None:
        x1 = jnp.clip(x1, 0, max_shape[1])
        y1 = jnp.clip(y1, 0, max_shape[0])
        x2 = jnp.clip(x2, 0, max_shape[1])
        y2 = jnp.clip(y2, 0, max_shape[0])
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def batched_rois(boxes: jax.Array) -> jax.Array:
    """[B, N, 4] boxes → [B*N, 5] rois with batch index in column 0.

    The TPU-native replacement for the reference's per-image Python loop
    in bbox2roi (mmdet/core/bbox/transforms.py:149-168): batch index is
    materialised with broadcasting, keeping the op fully vectorized.
    """
    b, n = boxes.shape[:2]
    idx = jnp.broadcast_to(jnp.arange(b, dtype=boxes.dtype)[:, None], (b, n))
    return jnp.concatenate([idx[..., None], boxes], axis=-1).reshape(b * n, 5)
