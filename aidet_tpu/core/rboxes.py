"""Oriented bounding-box (OBB) geometry, vectorized for TPU.

TPU-native reimplementation of the reference's OBB toolbox
(reference: mmdet/core/rbbox/transforms.py).  The reference operates on
Python lists / per-row numpy with cv2; here every representation
conversion, canonical sort and delta codec is a branchless jax.numpy
function over arbitrary leading batch dims, jit/vmap/pjit-safe.

Representations (all float arrays):
  thetaobb  [..., 5]  (cx, cy, w, h, theta)   theta in radians,
            canonical range [-pi/2, 0) — the legacy cv2.minAreaRect
            convention the reference inherits (transforms.py:30-42).
  pointobb  [..., 8]  (x1,y1,...,x4,y4)       4 corners, in order.
  hobb      [..., 5]  (x1, y1, x2, y2, h)     first edge + height
            (transforms.py:73-91).
  bbox      [..., 4]  (xmin, ymin, xmax, ymax) axis-aligned hull.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

HALF_PI = math.pi / 2.0


# ---------------------------------------------------------------------------
# representation conversions
# ---------------------------------------------------------------------------

def thetaobb2pointobb(thetaobb: jax.Array) -> jax.Array:
    """(cx,cy,w,h,theta) → 4 corners, cv2.boxPoints-compatible order.

    Parity: transforms.py:44-54 (thetaobb2pointobb via cv2.boxPoints).
    """
    cx, cy, w, h, theta = (thetaobb[..., i] for i in range(5))
    a = jnp.sin(theta) * 0.5
    b = jnp.cos(theta) * 0.5
    x0 = cx - a * h - b * w
    y0 = cy + b * h - a * w
    x1 = cx + a * h - b * w
    y1 = cy - b * h - a * w
    x2 = 2.0 * cx - x0
    y2 = 2.0 * cy - y0
    x3 = 2.0 * cx - x1
    y3 = 2.0 * cy - y1
    return jnp.stack([x0, y0, x1, y1, x2, y2, x3, y3], axis=-1)


def pointobb2bbox(pointobb: jax.Array) -> jax.Array:
    """4 corners → axis-aligned hull. Parity: transforms.py:57-70."""
    xs = pointobb[..., 0::2]
    ys = pointobb[..., 1::2]
    return jnp.stack([xs.min(-1), ys.min(-1), xs.max(-1), ys.max(-1)],
                     axis=-1)


def thetaobb2bbox(thetaobb: jax.Array) -> jax.Array:
    return pointobb2bbox(thetaobb2pointobb(thetaobb))


def pointobb2thetaobb(pointobb: jax.Array) -> jax.Array:
    """Min-area rotated rect of a quad → (cx,cy,w,h,theta).

    Replaces cv2.minAreaRect (transforms.py:30-42) with a branchless
    candidate-edge search: the minimum-area rectangle of a convex quad
    has one side parallel to one of its edges, so the 4 edge directions
    are the only candidates.  theta is normalised to [-pi/2, 0) and
    (w, h) are the extents along (theta, theta+pi/2), matching the
    legacy cv2 convention.
    """
    pts = pointobb.reshape(pointobb.shape[:-1] + (4, 2))
    nxt = jnp.roll(pts, -1, axis=-2)
    edges = nxt - pts                                       # [..., 4, 2]
    ang = jnp.arctan2(edges[..., 1], edges[..., 0])         # [..., 4]
    # fold into [-pi/2, 0): extent along phi == extent along phi±pi/2 swapped
    ang = jnp.mod(ang, HALF_PI) - HALF_PI

    cos = jnp.cos(ang)[..., None]                           # [..., 4, 1]
    sin = jnp.sin(ang)[..., None]
    x = pts[..., None, :, 0]                                # [..., 1, 4]
    y = pts[..., None, :, 1]
    u = x * cos + y * sin                                   # [..., 4, 4]
    v = -x * sin + y * cos
    umin, umax = u.min(-1), u.max(-1)                       # [..., 4]
    vmin, vmax = v.min(-1), v.max(-1)
    w = umax - umin
    h = vmax - vmin
    area = w * h
    k = jnp.argmin(area, axis=-1)

    take = lambda arr: jnp.take_along_axis(arr, k[..., None], axis=-1)[..., 0]
    theta = take(ang)
    w, h = take(w), take(h)
    uc = (take(umin) + take(umax)) * 0.5
    vc = (take(vmin) + take(vmax)) * 0.5
    ct, st = jnp.cos(theta), jnp.sin(theta)
    cx = uc * ct - vc * st
    cy = uc * st + vc * ct
    return jnp.stack([cx, cy, w, h, theta], axis=-1)


def pointobb_best_point_sort(pointobb: jax.Array) -> jax.Array:
    """Cyclic-shift corners so the ordering closest to the axis-aligned
    (tl, tr, br, bl) template comes first.

    Parity: transforms.py:118-134 (pointobb_best_point_sort): evaluate
    the 4 cyclic rolls against the corner order of the axis-aligned
    hull and keep the one with minimal squared distance.  Branchless:
    all rolls are materialised and selected with take_along_axis.
    """
    bbox = pointobb2bbox(pointobb)
    xmin, ymin, xmax, ymax = (bbox[..., i] for i in range(4))
    ref = jnp.stack([xmin, ymin, xmax, ymin, xmax, ymax, xmin, ymax],
                    axis=-1)
    # np.roll(v, 2k) on the flat 8-vector == rolling point order by k
    rolls = jnp.stack([jnp.roll(pointobb, 2 * s, axis=-1) for s in range(4)],
                      axis=-2)                              # [..., 4, 8]
    dist = jnp.sum((rolls - ref[..., None, :]) ** 2, axis=-1)
    best = jnp.argmin(dist, axis=-1)
    return jnp.take_along_axis(rolls, best[..., None, None],
                               axis=-2)[..., 0, :]


def pointobb_extreme_sort(pointobb: jax.Array) -> jax.Array:
    """Cyclic-shift corners so the top-most point (ties → left-most)
    comes first.  Parity: transforms.py:93-115 (pointobb_extreme_sort),
    with the tie-break generalised to a lexicographic (y, x) argmin.
    """
    xs = pointobb[..., 0::2]
    ys = pointobb[..., 1::2]
    miny = ys.min(-1, keepdims=True)
    x_masked = jnp.where(ys == miny, xs, jnp.inf)
    top = jnp.argmin(x_masked, axis=-1)
    rolls = jnp.stack([jnp.roll(pointobb, -2 * s, axis=-1) for s in range(4)],
                      axis=-2)
    return jnp.take_along_axis(rolls, top[..., None, None],
                               axis=-2)[..., 0, :]


def thetaobb2hobb(thetaobb: jax.Array) -> jax.Array:
    """(cx,cy,w,h,theta) → (x1,y1,x2,y2,h): best-sorted first edge plus
    the distance to the 4th corner.  Parity: transforms.py:73-91.
    """
    p = pointobb_best_point_sort(thetaobb2pointobb(thetaobb))
    h = jnp.sqrt((p[..., 6] - p[..., 0]) ** 2 + (p[..., 7] - p[..., 1]) ** 2)
    return jnp.stack([p[..., 0], p[..., 1], p[..., 2], p[..., 3], h], axis=-1)


def hobb2pointobb(hobb: jax.Array) -> jax.Array:
    """(x1,y1,x2,y2,h) → 4 corners.

    Parity: transforms.py:137-162 (hobb2pointobb), without the
    reference's int() truncation of the output (a lossy quirk there).
    """
    x1, y1, x2, y2, h = (hobb[..., i] for i in range(5))
    ang = HALF_PI - jnp.arctan2(y2 - y1, x2 - x1)
    dx = h * jnp.cos(ang)
    dy = h * jnp.sin(ang)
    x4 = x1 - dx
    y4 = y1 + dy
    x3 = x2 - dx
    y3 = y2 + dy
    return jnp.stack([x1, y1, x2, y2, x3, y3, x4, y4], axis=-1)


def hobb2thetaobb(hobb: jax.Array) -> jax.Array:
    return pointobb2thetaobb(hobb2pointobb(hobb))


def hobb_rolls(hobb: jax.Array) -> jax.Array:
    """All 4 cyclic first-edge representations of the same box,
    ``[..., 4, 5]``; slot 0 is the input itself.

    The hobb encoding is discontinuous at the best-point-sort flip
    (``pointobb_best_point_sort``): an infinitesimal rotation swaps
    which edge is "first", jumping the regression target by O(1)
    normalized units (tools/analyze_hobb.py quantifies this).  Every
    roll decodes to the same rectangle through ``hobb2pointobb``, so a
    sort-robust training loss may regress toward whichever
    representation is nearest (min-over-rolls) without changing
    inference semantics.
    """
    p = hobb2pointobb(hobb)
    rolls = jnp.stack([jnp.roll(p, -2 * s, axis=-1) for s in range(4)],
                      axis=-2)                              # [..., 4, 8]
    x1, y1 = rolls[..., 0], rolls[..., 1]
    x2, y2 = rolls[..., 2], rolls[..., 3]
    x4, y4 = rolls[..., 6], rolls[..., 7]
    h = jnp.sqrt((x4 - x1) ** 2 + (y4 - y1) ** 2)
    return jnp.stack([x1, y1, x2, y2, h], axis=-1)


def pointobb2hobb(pointobb: jax.Array) -> jax.Array:
    return thetaobb2hobb(pointobb2thetaobb(pointobb))


# ---------------------------------------------------------------------------
# flips / rescale (test-time mapping)
# ---------------------------------------------------------------------------

def thetaobb_flip(thetaobb: jax.Array, img_shape) -> jax.Array:
    """Horizontal flip. Parity: transforms.py:191-203."""
    w_img = img_shape[1]
    cx = w_img - thetaobb[..., 0] - 1
    theta = -HALF_PI - thetaobb[..., 4]
    return jnp.stack([cx, thetaobb[..., 1], thetaobb[..., 3],
                      thetaobb[..., 2], theta], axis=-1)


def pointobb_flip(pointobb: jax.Array, img_shape,
                  sort_method: str = "best") -> jax.Array:
    """Horizontal flip + canonical re-sort.

    Parity: rbbox/transforms.py:205-240: mirror x and swap points 2↔4
    to restore winding; the default 'best' branch then re-canonicalises
    with the best-point sort, while the legacy 'extreme' branch keeps
    the swapped order as-is (transforms.py:214-219).
    """
    w_img = img_shape[1]
    p = pointobb.reshape(pointobb.shape[:-1] + (4, 2))
    x = w_img - p[..., 0] - 1
    p = jnp.stack([x, p[..., 1]], axis=-1)
    p = p[..., jnp.array([0, 3, 2, 1]), :].reshape(pointobb.shape)
    if sort_method == "extreme":
        return p
    return pointobb_best_point_sort(p)


def hobb_flip(hobb: jax.Array, img_shape) -> jax.Array:
    """Horizontal flip via the pointobb route. Parity: transforms.py:243-278."""
    p = pointobb_flip(hobb2pointobb(hobb), img_shape)
    return thetaobb2hobb(pointobb2thetaobb(p))


def thetaobb_rescale(thetaobb, scale_factor, reverse=False):
    """Parity: transforms.py:283-296 (theta is not scaled)."""
    s = scale_factor if not reverse else 1.0 / scale_factor
    scale = jnp.asarray([s, s, s, s, 1.0], thetaobb.dtype)
    return thetaobb * scale


def pointobb_rescale(pointobb, scale_factor, reverse=False):
    s = scale_factor if not reverse else 1.0 / scale_factor
    return pointobb * s


def hobb_rescale(hobb, scale_factor, reverse=False):
    s = scale_factor if not reverse else 1.0 / scale_factor
    return hobb * s


# ---------------------------------------------------------------------------
# delta codecs (proposal HBB → OBB regression targets)
# ---------------------------------------------------------------------------

def _proposal_geometry(proposals):
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0] + 1.0
    ph = proposals[..., 3] - proposals[..., 1] + 1.0
    return px, py, pw, ph


def _normalize(deltas, means, stds):
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    return (deltas - means) / stds


def _denormalize_grouped(deltas, means, stds, d):
    """[..., K*d] → [..., K, d], denormalised."""
    k = deltas.shape[-1] // d
    out = deltas.reshape(deltas.shape[:-1] + (k, d))
    means = jnp.asarray(means, out.dtype)
    stds = jnp.asarray(stds, out.dtype)
    return out * stds + means


def thetaobb2delta(proposals, gt,
                   means=(0.,) * 5, stds=(1.,) * 5):
    """Encode thetaobb gt against HBB proposals.

    Parity: transforms.py:321-352 (thetaobb2delta): proposal theta is
    fixed at -pi/2; gt w/h get the legacy +1.
    """
    px, py, pw, ph = _proposal_geometry(proposals)
    dx = (gt[..., 0] - px) / pw
    dy = (gt[..., 1] - py) / ph
    dw = jnp.log((gt[..., 2] + 1.0) / pw)
    dh = jnp.log((gt[..., 3] + 1.0) / ph)
    dtheta = gt[..., 4] - (-HALF_PI)
    deltas = jnp.stack([dx, dy, dw, dh, dtheta], axis=-1)
    return _normalize(deltas, means, stds)


def delta2thetaobb(rois, deltas,
                   means=(0.,) * 5, stds=(1.,) * 5,
                   wh_ratio_clip=16.0 / 1000.0):
    """Parity: transforms.py:355-395 (delta2thetaobb)."""
    shape = deltas.shape
    d = _denormalize_grouped(deltas, means, stds, 5)
    dx, dy, dw, dh, dtheta = (d[..., i] for i in range(5))
    max_ratio = abs(math.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)
    px, py, pw, ph = (v[..., None] for v in _proposal_geometry(rois))
    gx = px + pw * dx
    gy = py + ph * dy
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gtheta = dtheta + (-HALF_PI)
    return jnp.stack([gx, gy, gw, gh, gtheta], axis=-1).reshape(shape)


def pointobb2delta(proposals, gt,
                   means=(0.,) * 8, stds=(1.,) * 8):
    """Encode 4-corner gt against the proposal's own corners.

    Parity: transforms.py:412-456 (pointobb2delta): proposal corners
    are its axis-aligned (tl, tr, br, bl); all offsets divided by
    proposal w (x) / h (y).
    """
    px, py, pw, ph = _proposal_geometry(proposals)
    x1, y1 = proposals[..., 0], proposals[..., 1]
    x2, y2 = proposals[..., 2], proposals[..., 3]
    pcorner = jnp.stack([x1, y1, x2, y1, x2, y2, x1, y2], axis=-1)
    denom = jnp.stack([pw, ph] * 4, axis=-1)
    deltas = (gt - pcorner) / denom
    return _normalize(deltas, means, stds)


def delta2pointobb(rois, deltas,
                   means=(0.,) * 8, stds=(1.,) * 8,
                   wh_ratio_clip=16.0 / 1000.0):
    """Parity: transforms.py:459-504 (delta2pointobb)."""
    del wh_ratio_clip  # kept for signature parity; reference ignores it too
    shape = deltas.shape
    d = _denormalize_grouped(deltas, means, stds, 8)
    px, py, pw, ph = _proposal_geometry(rois)
    x1, y1 = rois[..., 0], rois[..., 1]
    x2, y2 = rois[..., 2], rois[..., 3]
    pcorner = jnp.stack([x1, y1, x2, y1, x2, y2, x1, y2], axis=-1)
    denom = jnp.stack([pw, ph] * 4, axis=-1)
    out = d * denom[..., None, :] + pcorner[..., None, :]
    return out.reshape(shape)


def hobb2delta(proposals, gt,
               means=(0.,) * 5, stds=(1.,) * 5):
    """Encode hobb gt against proposals. Parity: transforms.py:522-555."""
    pw = proposals[..., 2] - proposals[..., 0] + 1.0
    ph = proposals[..., 3] - proposals[..., 1] + 1.0
    px1, py1 = proposals[..., 0], proposals[..., 1]
    px2 = proposals[..., 2]
    dx1 = (gt[..., 0] - px1) / pw
    dy1 = (gt[..., 1] - py1) / ph
    dx2 = (gt[..., 2] - px2) / pw
    dy2 = (gt[..., 3] - py1) / ph
    dh = (gt[..., 4] + 1.0 - ph) / ph
    deltas = jnp.stack([dx1, dy1, dx2, dy2, dh], axis=-1)
    return _normalize(deltas, means, stds)


def delta2hobb(rois, deltas,
               means=(0.,) * 5, stds=(1.,) * 5,
               wh_ratio_clip=16.0 / 1000.0):
    """Parity: transforms.py:558-599 (delta2hobb)."""
    shape = deltas.shape
    d = _denormalize_grouped(deltas, means, stds, 5)
    dx1, dy1, dx2, dy2, dh = (d[..., i] for i in range(5))
    max_ratio = abs(math.log(wh_ratio_clip))
    dh = jnp.clip(dh, -max_ratio, max_ratio)
    pw = (rois[..., 2] - rois[..., 0] + 1.0)[..., None]
    ph = (rois[..., 3] - rois[..., 1] + 1.0)[..., None]
    px1 = rois[..., 0][..., None]
    py1 = rois[..., 1][..., None]
    px2 = rois[..., 2][..., None]
    gx1 = pw * dx1 + px1
    gy1 = ph * dy1 + py1
    gx2 = pw * dx2 + px2
    gy2 = ph * dy2 + py1
    gh = ph * dh + ph
    return jnp.stack([gx1, gy1, gx2, gy2, gh], axis=-1).reshape(shape)


def rtheta2delta(rrois, gt, means=(0.,) * 5, stds=(1.,) * 5):
    """Encode thetaobb gt against ROTATED proposals (the rotated-RoI
    refinement codec, BASELINE config #3).

    No reference counterpart — aidet's rbbox heads only regress from
    HBB proposals (rbbox_head.py); this follows the RoI-Transformer /
    RRPN delta formulation: center offsets rotated into the proposal
    frame, log size ratios, raw angle difference.

    Args: rrois [..., 5] (cx, cy, w, h, theta); gt [..., 5].
    """
    px, py, pw, ph, pt = (rrois[..., i] for i in range(5))
    pw = jnp.maximum(pw, 1e-4)
    ph = jnp.maximum(ph, 1e-4)
    cos, sin = jnp.cos(pt), jnp.sin(pt)
    ox = gt[..., 0] - px
    oy = gt[..., 1] - py
    dx = (cos * ox + sin * oy) / pw
    dy = (-sin * ox + cos * oy) / ph
    dw = jnp.log(jnp.maximum(gt[..., 2], 1e-4) / pw)
    dh = jnp.log(jnp.maximum(gt[..., 3], 1e-4) / ph)
    dt = gt[..., 4] - pt
    deltas = jnp.stack([dx, dy, dw, dh, dt], axis=-1)
    return _normalize(deltas, means, stds)


def delta2rtheta(rrois, deltas, means=(0.,) * 5, stds=(1.,) * 5,
                 wh_ratio_clip=16.0 / 1000.0):
    """Inverse of :func:`rtheta2delta` (supports per-class groups)."""
    shape = deltas.shape
    d = _denormalize_grouped(deltas, means, stds, 5)
    dx, dy, dw, dh, dt = (d[..., i] for i in range(5))
    max_ratio = abs(math.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)
    px, py, pw, ph, pt = (rrois[..., i][..., None] for i in range(5))
    cos, sin = jnp.cos(pt), jnp.sin(pt)
    ox = cos * (pw * dx) - sin * (ph * dy)
    oy = sin * (pw * dx) + cos * (ph * dy)
    gx = px + ox
    gy = py + oy
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gt_ = pt + dt
    return jnp.stack([gx, gy, gw, gh, gt_], axis=-1).reshape(shape)


# encode-name → (codec dim, encode fn, decode fn, to-pointobb fn)
RBBOX_CODECS = {
    "thetaobb": (5, thetaobb2delta, delta2thetaobb, thetaobb2pointobb),
    "pointobb": (8, pointobb2delta, delta2pointobb, lambda x: x),
    "hobb": (5, hobb2delta, delta2hobb, hobb2pointobb),
    # rotated-proposal refinement codec: proposals are [*, 5] rotated
    # boxes, NOT HBBs — only valid for heads fed by rotated RoI crops
    "rtheta": (5, rtheta2delta, delta2rtheta, thetaobb2pointobb),
}
