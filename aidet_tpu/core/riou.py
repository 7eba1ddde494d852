"""Rotated (polygon) IoU — first-class, jit-compiled, fixed-shape.

The reference has NO native rotated-IoU kernel: its "rotated NMS"
reuses horizontal-box keep indices (mmdet/core/post_processing/
rbbox_nms.py:64-118) and full-scene merge delegates to the external
wwtool package.  Here rotated IoU is a branchless Sutherland–Hodgman
convex clip between quads, with every polygon held in a fixed 8-slot
buffer (a convex quad ∩ convex quad has ≤ 8 vertices), so the whole
N×M pairwise computation stays inside one XLA program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_MAX_V = 8  # max vertices of quad ∩ quad


def _ensure_ccw(pts: jax.Array) -> jax.Array:
    """Orient a quad counter-clockwise (in y-down image coords this is
    the negative-shoelace orientation; only consistency matters)."""
    x, y = pts[..., 0], pts[..., 1]
    area2 = jnp.sum(x * jnp.roll(y, -1, -1) - jnp.roll(x, -1, -1) * y,
                    axis=-1)
    flipped = pts[..., ::-1, :]
    return jnp.where((area2 < 0)[..., None, None], flipped, pts)


def _clip_halfplane(poly: jax.Array, n: jax.Array,
                    a: jax.Array, b: jax.Array):
    """Clip polygon (8-slot buffer `poly`, `n` valid) by the half-plane
    on the left of directed edge a→b.  Returns (new_poly, new_n)."""
    ex, ey = b[0] - a[0], b[1] - a[1]

    def side(p):  # >=0 → inside (left of edge for CCW clipper)
        return ex * (p[1] - a[1]) - ey * (p[0] - a[0])

    def body(i, carry):
        out, cnt = carry
        cur = poly[i]
        j = jnp.where(i + 1 < n, i + 1, 0)
        nxt = poly[j]
        s_cur = side(cur)
        s_nxt = side(nxt)
        t = s_cur / jnp.where(s_cur - s_nxt == 0, 1e-30, s_cur - s_nxt)
        inter = cur + t * (nxt - cur)

        valid = i < n
        emit_cur = valid & (s_cur >= 0)
        emit_int = valid & ((s_cur >= 0) != (s_nxt >= 0))

        out = jax.lax.cond(
            emit_cur, lambda o: o.at[cnt].set(cur), lambda o: o, out)
        cnt = cnt + emit_cur.astype(jnp.int32)
        out = jax.lax.cond(
            emit_int, lambda o: o.at[cnt].set(inter), lambda o: o, out)
        cnt = cnt + emit_int.astype(jnp.int32)
        return out, cnt

    init = (jnp.zeros((_MAX_V, 2), poly.dtype), jnp.int32(0))
    return jax.lax.fori_loop(0, _MAX_V, body, init)


def _poly_area(poly: jax.Array, n: jax.Array) -> jax.Array:
    """Shoelace area of the first `n` slots (sign-free)."""
    idx = jnp.arange(_MAX_V)
    nxt = jnp.where(idx + 1 < n, idx + 1, 0)
    x, y = poly[:, 0], poly[:, 1]
    term = x * y[nxt] - x[nxt] * y
    term = jnp.where(idx < n, term, 0.0)
    return 0.5 * jnp.abs(jnp.sum(term))


def _quad_pair_intersection(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Intersection area of two (4,2) quads (any winding)."""
    poly = jnp.zeros((_MAX_V, 2), q1.dtype).at[:4].set(q1)
    n = jnp.int32(4)

    def clip_edge(k, carry):
        poly, n = carry
        a = q2[k]
        b = q2[(k + 1) % 4]
        return _clip_halfplane(poly, n, a, b)

    # Unrolled over the 4 clip edges (k is static → cheap indexing).
    for k in range(4):
        poly, n = clip_edge(k, (poly, n))
    return _poly_area(poly, n)


def quad_areas(quads: jax.Array) -> jax.Array:
    """Shoelace areas of [..., 8] quads."""
    pts = quads.reshape(quads.shape[:-1] + (4, 2))
    x, y = pts[..., 0], pts[..., 1]
    return 0.5 * jnp.abs(jnp.sum(
        x * jnp.roll(y, -1, -1) - jnp.roll(x, -1, -1) * y, axis=-1))


@functools.partial(jax.jit, static_argnames=("mode", "aligned"))
def quad_overlaps(quads1: jax.Array, quads2: jax.Array,
                  mode: str = "iou", aligned: bool = False) -> jax.Array:
    """Pairwise polygon IoU between two quad sets.

    Args:
      quads1: [N, 8]; quads2: [M, 8]  (flattened 4-corner polygons).
      mode: 'iou' or 'iof' (intersection over first's area).
      aligned: if True, N == M and result is [N]; else [N, M].
    Returns IoU array; degenerate (zero-area) quads give 0.
    """
    p1 = _ensure_ccw(quads1.reshape(-1, 4, 2)).astype(jnp.float32)
    p2 = _ensure_ccw(quads2.reshape(-1, 4, 2)).astype(jnp.float32)
    a1 = quad_areas(quads1)
    a2 = quad_areas(quads2)

    if aligned:
        inter = jax.vmap(_quad_pair_intersection)(p1, p2)
    else:
        row = jax.vmap(
            lambda q1: jax.vmap(
                lambda q2: _quad_pair_intersection(q1, q2))(p2))
        n, m = p1.shape[0], p2.shape[0]
        chunk = 32
        if n * m > 64 * 64 and n > chunk:
            # chunk the outer set so the clip intermediates (up to
            # [chunk, M, 8, 2] scratch polygons per step) never
            # materialize for all N*M pairs at once — the full nested
            # vmap allocates [N, M, 8, 2] PER outer-vmap lane, which
            # OOMs HBM at multiclass-rnms scale (B=8 x C=15 x 256^2
            # pairs = 32 GB).  lax.map keeps the chunks sequential
            # even under those outer vmaps.
            pad = -n % chunk
            p1p = jnp.pad(p1, ((0, pad), (0, 0), (0, 0)))
            inter = jax.lax.map(
                row, p1p.reshape(-1, chunk, 4, 2)).reshape(-1, m)[:n]
        else:
            inter = row(p1)
        a1 = a1[:, None]
        a2 = a2[None, :]

    if mode == "iou":
        denom = a1 + a2 - inter
    else:
        denom = jnp.broadcast_to(a1, inter.shape)
    return jnp.where(denom > 1e-10, inter / jnp.maximum(denom, 1e-10), 0.0)


def thetaobb_overlaps(t1: jax.Array, t2: jax.Array, mode="iou",
                      aligned=False) -> jax.Array:
    """Rotated IoU between two thetaobb sets."""
    from .rboxes import thetaobb2pointobb
    return quad_overlaps(thetaobb2pointobb(t1), thetaobb2pointobb(t2),
                         mode=mode, aligned=aligned)


# ---------------------------------------------------------------------------
# host-side (numpy) min-area rect: convex hull + rotating calipers.
# Used on the eval path (mask → OBB), replacing cv2.minAreaRect on
# contours (reference: transforms.py:166-187 maskobb2thetaobb).
# ---------------------------------------------------------------------------

def min_area_rect_np(points):
    """Min-area rotated rect around a point set.

    Args:
      points: np.ndarray [N, 2] (N ≥ 1).
    Returns:
      (cx, cy, w, h, theta) with theta in [-pi/2, 0), matching the
      legacy cv2.minAreaRect convention used throughout the reference.
    """
    import numpy as np

    pts = np.asarray(points, dtype=np.float64)
    if len(pts) == 1:
        return float(pts[0, 0]), float(pts[0, 1]), 0.0, 0.0, -np.pi / 2

    # Andrew's monotone chain convex hull
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def half_hull(p):
        hull = []
        for q in p:
            while len(hull) >= 2:
                o, a = hull[-2], hull[-1]
                if (a[0] - o[0]) * (q[1] - o[1]) - (a[1] - o[1]) * (q[0] - o[0]) <= 0:
                    hull.pop()
                else:
                    break
            hull.append(q)
        return hull

    lower = half_hull(pts)
    upper = half_hull(pts[::-1])
    hull = np.array(lower[:-1] + upper[:-1])
    if len(hull) < 2:
        c = pts.mean(0)
        return float(c[0]), float(c[1]), 0.0, 0.0, -np.pi / 2

    edges = np.roll(hull, -1, axis=0) - hull
    ang = np.arctan2(edges[:, 1], edges[:, 0])
    ang = np.mod(ang, np.pi / 2) - np.pi / 2
    ang = np.unique(ang)

    best = None
    for a in ang:
        c, s = np.cos(a), np.sin(a)
        u = hull[:, 0] * c + hull[:, 1] * s
        v = -hull[:, 0] * s + hull[:, 1] * c
        w = u.max() - u.min()
        h = v.max() - v.min()
        area = w * h
        if best is None or area < best[0]:
            uc = (u.max() + u.min()) / 2
            vc = (v.max() + v.min()) / 2
            cx = uc * c - vc * s
            cy = uc * s + vc * c
            best = (area, cx, cy, w, h, a)
    _, cx, cy, w, h, a = best
    return float(cx), float(cy), float(w), float(h), float(a)
