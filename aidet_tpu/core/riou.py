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
    """Intersection areas of CCW quads — sub-edge line integral.

    EXPERIMENTAL (non-default; see the _INTER selection below for the
    failure mode that keeps the hull build the default).
    Green's-theorem formulation: the boundary of P∩Q consists of
    sub-segments of
    P's edges inside Q and of Q's edges inside P.  Each straight piece
    with endpoints s→e contributes cross(s, e) to the shoelace sum, and
    the sum is ORDER-INDEPENDENT (addition commutes; shoelace is a sum
    over boundary edges) — so no angular sort is needed at all.  For an
    edge a→a+d clipped to t ∈ [t0, t1] the contribution collapses to
    (t1 − t0)·cross(a, d).

    Clipping a segment against a convex quad is 4 linear constraints
    f_j(t) = A_j + t·B_j ≥ 0 → interval [max lower, min upper]: pure
    elementwise max/min, no scatter, no sort.

    Coincident boundaries (duplicate detections — the NMS common case)
    would double-count, and a merely "strict vs inclusive" tiebreak
    gets the touching-but-disjoint case wrong.  The exact, eps-free
    resolution is SYMBOLIC PERTURBATION: resolve every
    parallel-edge-ON-boundary case (f ≡ 0, the only case where
    open/closed matters — interval endpoints are measure-zero for the
    integral) as if Q were shifted by an infinitesimal δ·(1, ω):
      · P edges against a Q half-plane with edge vector e: keep iff
        e_y > 0, tie (e_y == 0) → keep iff e_x < 0
      · Q edges against a P half-plane: the exact complement.
    Hand-checked: identical quads → every boundary edge counted once
    (IoU 1); touching squares sharing an edge → both copies dropped
    (IoU 0); partial shared edge → shared segment counted once.

    Numerics: the integrand cross(a, d) is origin-DEPENDENT, so
    coordinates are centered on P's mean vertex first — otherwise
    near-parallel clips amplify t-roundoff by |a| (translation leaves
    the exact area invariant but dominates the f32 error term).

    vs the hull build: no [24, …] candidate buffers (peak scratch
    ~3× smaller), no argsort over 24 candidates per pair (the former
    bandwidth hot spot), same exactness.

    Args:
      px, py: [4, *dims] P-quad vertex coordinates (vertex axis LEADING).
      qx, qy: [4, *dims] Q-quad vertex coordinates (broadcastable).
    Returns: [*dims] f32 intersection areas.
    """
    # common origin for the integrand: A, B and the t-interval are
    # translation-invariant (built purely from coordinate differences),
    # so only the contribution term is centered — and because the
    # pieces form a closed boundary, a COMMON shift leaves the summed
    # area exact while shrinking |a| from image scale to quad scale
    cx = (px[0] + px[1] + px[2] + px[3]) * 0.25
    cy = (py[0] + py[1] + py[2] + py[3]) * 0.25

    def pieces(ax_, ay_, axn, ayn, bx_, by_, bxn, byn, qside):
        """Σ over the 4 a-edges of their inside-b piece contributions.

        qside: True when clipping Q's edges against P's half-planes
        (flips the symbolic-perturbation tiebreak).  Returns [*dims]."""
        total = None
        ex = [bxn[j] - bx_[j] for j in range(4)]   # b edge vectors
        ey = [byn[j] - by_[j] for j in range(4)]
        s = 1.0 if qside else -1.0
        ne = [jnp.abs(ex[j]) + jnp.abs(ey[j]) for j in range(4)]
        for i in range(4):
            a_x, a_y = ax_[i], ay_[i]
            dx, dy = axn[i] - a_x, ayn[i] - a_y
            nd = jnp.abs(dx) + jnp.abs(dy)
            t0 = None
            t1 = None
            dead = None
            for j in range(4):
                # f(t) = cross(e_j, a + t d - b_j) = A + t B.
                # A is evaluated against whichever ENDPOINT of the
                # clipping edge is nearer: the f32 error of the cross
                # is ~ulp·|e|·|r|, and for near-duplicate quads (the
                # NMS regime) the far anchor's cancellation noise
                # exceeds the true line offset, flipping in/out
                # decisions at random.  Both anchors lie on the same
                # line, so this is exact in real arithmetic.
                r0x, r0y = a_x - bx_[j], a_y - by_[j]
                r1x, r1y = a_x - bxn[j], a_y - byn[j]
                near0 = (jnp.abs(r0x) + jnp.abs(r0y)
                         <= jnp.abs(r1x) + jnp.abs(r1y))
                rx = jnp.where(near0, r0x, r1x)
                ry = jnp.where(near0, r0y, r1y)
                A = ex[j] * ry - ey[j] * rx
                B = ex[j] * dy - ey[j] * dx
                # near-parallel (|B| below a RELATIVE threshold) is
                # treated as exactly parallel: the f32 cancellation in
                # A makes t = -A/B garbage there (t-error ~ ulp·|a-b|/
                # |B|·…), and unlike the hull build — where a crossing
                # point misplaced ALONG the edge is harmless — a span
                # error multiplies the full lever arm.  The parallel
                # wedge approximated away is ≤ thr·|d|²/2, ~1e-4 of
                # the quad area.
                con = jnp.abs(B) > 1e-4 * ne[j] * nd
                safe = jnp.where(con, B, 1.0)
                r = -A / safe
                lo = jnp.where(con & (B > 0), r, 0.0)
                hi = jnp.where(con & (B < 0), r, 1.0)
                # parallel on/near-boundary (|A| inside the roundoff
                # band): keep iff the symbolic δ·(1, ω) shift of Q
                # moves this edge to the inside of the half-plane
                alive0 = (s * ey[j] < 0) | ((ey[j] == 0)
                                            & (s * ex[j] > 0))
                an = 1e-6 * ne[j] * (jnp.abs(rx) + jnp.abs(ry))
                dd = (~con) & ((A < -an)
                               | ((jnp.abs(A) <= an) & ~alive0))
                t0 = lo if t0 is None else jnp.maximum(t0, lo)
                t1 = hi if t1 is None else jnp.minimum(t1, hi)
                dead = dd if dead is None else (dead | dd)
            t0 = jnp.clip(t0, 0.0, 1.0)
            t1 = jnp.clip(t1, 0.0, 1.0)
            span = jnp.where(dead, 0.0, jnp.maximum(t1 - t0, 0.0))
            contrib = span * ((a_x - cx) * dy - (a_y - cy) * dx)
            total = contrib if total is None else total + contrib
        return total

    two_area = (pieces(px, py, [px[(i + 1) % 4] for i in range(4)],
                       [py[(i + 1) % 4] for i in range(4)],
                       qx, qy, [qx[(j + 1) % 4] for j in range(4)],
                       [qy[(j + 1) % 4] for j in range(4)], False)
                + pieces(qx, qy, [qx[(j + 1) % 4] for j in range(4)],
                         [qy[(j + 1) % 4] for j in range(4)],
                         px, py, [px[(i + 1) % 4] for i in range(4)],
                         [py[(i + 1) % 4] for i in range(4)], True))
    return jnp.maximum(0.5 * two_area, 0.0)


def _inter_soa_hull(px, py, qx, qy):
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


import os as _os

# Default: the 24-candidate convex-hull build.  AIDET_RIOU_IMPL=integral
# selects the experimental sub-edge line-integral formulation (read at
# trace time) — see its docstring for why it is NOT the default: the
# integral needs a numerically CLOSED boundary, and for near-duplicate
# quads (the defining NMS workload) the near-coincident boundary pieces
# of P and Q are split at independently-computed, ill-conditioned
# crossing parameters; any inconsistency breaks closure and costs
# O(piece) area, not O(sliver).  The hull build is immune: every
# candidate point lies ON a true boundary line, so misplacement along
# an edge barely moves the hull.  Measured on the hobb-roundtrip pair
# (tests/test_rboxes.py): hull 4715.1 px² (= f64 truth), integral
# 3536.3 — a dropped near-coincident piece, 25% IoU error.
_INTER = (_inter_soa if _os.environ.get("AIDET_RIOU_IMPL") == "integral"
          else _inter_soa_hull)


def _inter_block(p1: jax.Array, p2: jax.Array) -> jax.Array:
    """All-pairs intersection areas: p1 [N,4,2] × p2 [M,4,2] → [N,M]."""
    px = jnp.transpose(p1[..., 0])[:, :, None]   # [4, N, 1]
    py = jnp.transpose(p1[..., 1])[:, :, None]
    qx = jnp.transpose(p2[..., 0])[:, None, :]   # [4, 1, M]
    qy = jnp.transpose(p2[..., 1])[:, None, :]
    return _INTER(px, py, qx, qy)


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
        inter = _INTER(px, py, qx, qy)
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
