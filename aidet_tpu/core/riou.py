"""Rotated (polygon) IoU — first-class, jit-compiled, fixed-shape.

The reference has NO native rotated-IoU kernel: its "rotated NMS"
reuses horizontal-box keep indices (mmdet/core/post_processing/
rbbox_nms.py:64-118) and full-scene merge delegates to the external
wwtool package.  Here rotated IoU is computed in a TPU-first
structure-of-arrays formulation: the intersection of two convex quads
is the convex hull of ≤ 24 candidate points (4 P-corners inside Q,
4 Q-corners inside P, 16 edge crossings), so per pair we build the
candidate set with pure elementwise ops, sort by angle around the
candidate centroid, and take the shoelace area.  Every intermediate
keeps the candidate index on a LEADING axis and the (N, M) pair axes
TRAILING, so arrays tile cleanly onto the TPU (8, 128) layout.  The
previous Sutherland–Hodgman version carried per-pair (8, 2) scratch
polygons on the trailing axes, which padded 64× under batched vmaps
(f32[8,15,256,256,8,2] → a 32 GB allocation at the RetinaNetOBB e2e
predict shapes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_MAX_V = 24   # candidate vertices of quad ∩ quad (4 + 4 + 16)
_BIG_ANG = 1e9


def _ensure_ccw(pts: jax.Array) -> jax.Array:
    """Orient a quad counter-clockwise (in y-down image coords this is
    the negative-shoelace orientation; only consistency matters)."""
    x, y = pts[..., 0], pts[..., 1]
    area2 = jnp.sum(x * jnp.roll(y, -1, -1) - jnp.roll(x, -1, -1) * y,
                    axis=-1)
    flipped = pts[..., ::-1, :]
    return jnp.where((area2 < 0)[..., None, None], flipped, pts)


def _inter_soa(px, py, qx, qy):
    """Intersection areas of CCW quads, structure-of-arrays.

    Args:
      px, py: [4, *dims] P-quad vertex coordinates (vertex axis LEADING).
      qx, qy: [4, *dims] Q-quad vertex coordinates (broadcastable).
    Returns: [*dims] f32 intersection areas.

    All intermediates are [k, *dims] with small k leading — under any
    outer vmap the batch axes extend *dims* and the trailing two axes
    stay large, so nothing pads against the (8, 128) TPU tile.
    """
    pxn = [px[(i + 1) % 4] for i in range(4)]
    pyn = [py[(i + 1) % 4] for i in range(4)]
    qxn = [qx[(j + 1) % 4] for j in range(4)]
    qyn = [qy[(j + 1) % 4] for j in range(4)]

    cx_list, cy_list, cv_list = [], [], []

    # (a) P vertices strictly-or-boundary inside Q (all CCW edge crosses ≥ 0)
    for i in range(4):
        inside = None
        for j in range(4):
            cr = ((qxn[j] - qx[j]) * (py[i] - qy[j])
                  - (qyn[j] - qy[j]) * (px[i] - qx[j]))
            ok = cr >= 0
            inside = ok if inside is None else (inside & ok)
        cx_list.append(jnp.broadcast_to(px[i], inside.shape))
        cy_list.append(jnp.broadcast_to(py[i], inside.shape))
        cv_list.append(inside)

    # (b) Q vertices inside P
    for j in range(4):
        inside = None
        for i in range(4):
            cr = ((pxn[i] - px[i]) * (qy[j] - py[i])
                  - (pyn[i] - py[i]) * (qx[j] - px[i]))
            ok = cr >= 0
            inside = ok if inside is None else (inside & ok)
        cx_list.append(jnp.broadcast_to(qx[j], inside.shape))
        cy_list.append(jnp.broadcast_to(qy[j], inside.shape))
        cv_list.append(inside)

    # (c) 16 edge-edge crossings (segment param test; denom guarded so
    # no inf/NaN ever enters the candidate buffers)
    for i in range(4):
        d1x, d1y = pxn[i] - px[i], pyn[i] - py[i]
        for j in range(4):
            d2x, d2y = qxn[j] - qx[j], qyn[j] - qy[j]
            denom = d1x * d2y - d1y * d2x
            ok_d = jnp.abs(denom) > 1e-12
            safe = jnp.where(ok_d, denom, 1.0)
            rx, ry = qx[j] - px[i], qy[j] - py[i]
            t = (rx * d2y - ry * d2x) / safe
            u = (rx * d1y - ry * d1x) / safe
            valid = ok_d & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
            t = jnp.clip(t, 0.0, 1.0)
            cx_list.append(px[i] + t * d1x)
            cy_list.append(py[i] + t * d1y)
            cv_list.append(valid)

    cand_x = jnp.stack(cx_list)            # [24, *dims]
    cand_y = jnp.stack(cy_list)
    valid = jnp.stack(cv_list)
    cnt = jnp.sum(valid, axis=0)           # [*dims]

    vf = valid.astype(cand_x.dtype)
    denom_c = jnp.maximum(cnt, 1).astype(cand_x.dtype)
    ctr_x = jnp.sum(cand_x * vf, 0) / denom_c
    ctr_y = jnp.sum(cand_y * vf, 0) / denom_c

    # every candidate lies ON the convex intersection boundary, and the
    # centroid is interior, so sorting by angle yields the polygon in
    # CCW order (duplicates share an angle and contribute zero area)
    ang = jnp.arctan2(cand_y - ctr_y, cand_x - ctr_x)
    ang = jnp.where(valid, ang, _BIG_ANG)
    order = jnp.argsort(ang, axis=0)
    sx = jnp.take_along_axis(cand_x, order, 0)
    sy = jnp.take_along_axis(cand_y, order, 0)

    idx_shape = (_MAX_V,) + (1,) * cnt.ndim
    idx = jnp.arange(_MAX_V).reshape(idx_shape)
    nxt = jnp.where(idx + 1 < cnt[None], idx + 1, 0)
    xn = jnp.take_along_axis(sx, nxt, 0)
    yn = jnp.take_along_axis(sy, nxt, 0)
    term = jnp.where(idx < cnt[None], sx * yn - xn * sy, 0.0)
    area = 0.5 * jnp.abs(jnp.sum(term, 0))
    return jnp.where(cnt >= 3, area, 0.0)


def _inter_block(p1: jax.Array, p2: jax.Array) -> jax.Array:
    """All-pairs intersection areas: p1 [N,4,2] × p2 [M,4,2] → [N,M]."""
    px = jnp.transpose(p1[..., 0])[:, :, None]   # [4, N, 1]
    py = jnp.transpose(p1[..., 1])[:, :, None]
    qx = jnp.transpose(p2[..., 0])[:, None, :]   # [4, 1, M]
    qy = jnp.transpose(p2[..., 1])[:, None, :]
    return _inter_soa(px, py, qx, qy)


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
        px = jnp.transpose(p1[..., 0])   # [4, N]
        py = jnp.transpose(p1[..., 1])
        qx = jnp.transpose(p2[..., 0])
        qy = jnp.transpose(p2[..., 1])
        inter = _inter_soa(px, py, qx, qy)
    else:
        n, m = p1.shape[0], p2.shape[0]
        chunk = 32
        if n * m > 64 * 64 and n > chunk:
            # chunk the row set so the [24, chunk, M] candidate buffers
            # never materialize for all N rows at once.  lax.fori_loop
            # (not lax.map/scan over a reshaped axis) so the loop stays
            # SEQUENTIAL under any outer vmap — vmapping a while-loop
            # batches the carry, never unrolls the trip axis, which is
            # what keeps peak memory flat at multiclass-rnms scale
            # (B=8 × C=15 × 256² pairs).  Chunk-size tuning, measured
            # round 5: raising chunk to 128 with a 256² single-block
            # threshold put the compiled peak at 9.9 GB for the
            # RetinaNetOBB e2e predict (each fori step keeps ~10 live
            # [24, chunk, M] buffers PER batch×class vmap lane) — too
            # close to HBM for batch-16 flagship predict.  chunk=32
            # stays.
            pad = -n % chunk
            p1p = jnp.pad(p1, ((0, pad), (0, 0), (0, 0)))
            npad = n + pad

            def body(ci, out):
                rows = jax.lax.dynamic_slice(
                    p1p, (ci * chunk, 0, 0), (chunk, 4, 2))
                blk = _inter_block(rows, p2)
                return jax.lax.dynamic_update_slice(
                    out, blk, (ci * chunk, 0))

            inter = jax.lax.fori_loop(
                0, npad // chunk, body,
                jnp.zeros((npad, m), jnp.float32))[:n]
        else:
            inter = _inter_block(p1, p2)
        a1 = a1[:, None]
        a2 = a2[None, :]

    # intersection ⊆ each operand, always: clamps the spurious
    # candidates a zero-area quad admits (its degenerate half-plane
    # tests are trivially true, so the OTHER quad's corners all pass)
    inter = jnp.minimum(inter, jnp.minimum(a1, a2))

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
