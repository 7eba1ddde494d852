"""Rotated-IoU tests against a numpy Sutherland–Hodgman oracle."""

import math

import jax.numpy as jnp
import numpy as np

from aidet_tpu.core import rboxes
from aidet_tpu.core.riou import quad_overlaps, thetaobb_overlaps


def _clip_np(subject, a, b):
    out = []
    n = len(subject)
    for i in range(n):
        cur, nxt = subject[i], subject[(i + 1) % n]
        ex, ey = b[0] - a[0], b[1] - a[1]
        s_cur = ex * (cur[1] - a[1]) - ey * (cur[0] - a[0])
        s_nxt = ex * (nxt[1] - a[1]) - ey * (nxt[0] - a[0])
        if s_cur >= 0:
            out.append(cur)
        if (s_cur >= 0) != (s_nxt >= 0):
            t = s_cur / (s_cur - s_nxt)
            out.append(cur + t * (nxt - cur))
    return out


def _poly_iou_np(q1, q2):
    def ccw(p):
        x, y = p[:, 0], p[:, 1]
        if np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y) < 0:
            return p[::-1]
        return p

    p1 = ccw(q1.reshape(4, 2).astype(np.float64))
    p2 = ccw(q2.reshape(4, 2).astype(np.float64))
    poly = list(p1)
    for k in range(4):
        if not poly:
            break
        poly = _clip_np(np.array(poly), p2[k], p2[(k + 1) % 4])
    if len(poly) < 3:
        inter = 0.0
    else:
        pts = np.array(poly)
        x, y = pts[:, 0], pts[:, 1]
        inter = 0.5 * abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))

    def area(p):
        x, y = p[:, 0], p[:, 1]
        return 0.5 * abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))

    u = area(p1) + area(p2) - inter
    return inter / u if u > 0 else 0.0


def random_quads(n, seed):
    rng = np.random.RandomState(seed)
    t = np.stack([rng.uniform(40, 160, n), rng.uniform(40, 160, n),
                  rng.uniform(10, 80, n), rng.uniform(10, 80, n),
                  rng.uniform(-math.pi / 2 + 1e-3, -1e-3, n)], -1)
    return np.asarray(rboxes.thetaobb2pointobb(jnp.asarray(
        t.astype(np.float32))))


def test_identity_iou_is_one():
    q = random_quads(16, 0)
    out = np.asarray(quad_overlaps(jnp.asarray(q), jnp.asarray(q),
                                   aligned=True))
    np.testing.assert_allclose(out, np.ones(16), atol=1e-4)


def test_disjoint_iou_is_zero():
    q1 = np.array([[0., 0., 10., 0., 10., 10., 0., 10.]], np.float32)
    q2 = q1 + 100.0
    out = np.asarray(quad_overlaps(jnp.asarray(q1), jnp.asarray(q2)))
    np.testing.assert_allclose(out, [[0.0]], atol=1e-6)


def test_axis_aligned_known_value():
    # two unit-offset 10x10 squares: inter 50, union 150
    q1 = np.array([[0., 0., 10., 0., 10., 10., 0., 10.]], np.float32)
    q2 = np.array([[5., 0., 15., 0., 15., 10., 5., 10.]], np.float32)
    out = np.asarray(quad_overlaps(jnp.asarray(q1), jnp.asarray(q2)))
    np.testing.assert_allclose(out, [[50. / 150.]], atol=1e-5)


def test_rotated_cross_known_value():
    # two 20x4 rectangles crossing at 90°: inter 16, union 2*80-16=144
    t1 = jnp.array([[50., 50., 20., 4., -1e-4]])
    t2 = jnp.array([[50., 50., 4., 20., -1e-4]])
    out = np.asarray(thetaobb_overlaps(t1, t2))
    np.testing.assert_allclose(out, [[16. / 144.]], atol=1e-3)


def test_pairwise_matches_numpy_oracle():
    q1 = random_quads(12, 1)
    q2 = random_quads(15, 2)
    ours = np.asarray(quad_overlaps(jnp.asarray(q1), jnp.asarray(q2)))
    oracle = np.zeros((12, 15))
    for i in range(12):
        for j in range(15):
            oracle[i, j] = _poly_iou_np(q1[i], q2[j])
    np.testing.assert_allclose(ours, oracle, atol=1e-4)


def test_containment_iof():
    big = np.array([[0., 0., 100., 0., 100., 100., 0., 100.]], np.float32)
    small = np.array([[10., 10., 20., 10., 20., 20., 10., 20.]], np.float32)
    iof = np.asarray(quad_overlaps(jnp.asarray(small), jnp.asarray(big),
                                   mode="iof"))
    np.testing.assert_allclose(iof, [[1.0]], atol=1e-5)


def test_degenerate_quads_give_zero():
    z = np.zeros((1, 8), np.float32)
    q = random_quads(1, 3)
    out = np.asarray(quad_overlaps(jnp.asarray(z), jnp.asarray(q)))
    np.testing.assert_allclose(out, [[0.0]])
    out2 = np.asarray(quad_overlaps(jnp.asarray(z), jnp.asarray(z)))
    np.testing.assert_allclose(out2, [[0.0]])


def _degenerate_suite():
    """Quad pairs that exercise parallel / collinear / touching /
    zero-area geometry — the cases where the clip parameter t blows up
    (round-4 bench RuntimeWarning) or candidate masks go ragged."""
    sq = np.array([0., 0., 10., 0., 10., 10., 0., 10.], np.float32)
    cases = [
        # identical squares (every edge pair parallel or collinear)
        (sq, sq.copy(), 1.0),
        # shared edge, disjoint interiors
        (sq, sq + np.array([10, 0] * 4, np.float32), 0.0),
        # shared corner only
        (sq, sq + np.array([10, 10] * 4, np.float32), 0.0),
        # collinear overlap strip (half-offset along x)
        (sq, sq + np.array([5, 0] * 4, np.float32), 50. / 150.),
        # zero-area (degenerate line) quad vs square
        (np.array([0., 0., 10., 0., 10., 0., 0., 0.], np.float32), sq, 0.0),
        # zero-area point quad
        (np.full(8, 5., np.float32), sq, 0.0),
        # nested (containment), parallel edges
        (np.array([2., 2., 8., 2., 8., 8., 2., 8.], np.float32), sq,
         36. / 100.),
    ]
    return cases


def test_degenerate_geometry_device():
    import warnings
    for q1, q2, expect in _degenerate_suite():
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            out = float(np.asarray(
                quad_overlaps(jnp.asarray(q1[None]),
                              jnp.asarray(q2[None])))[0, 0])
        np.testing.assert_allclose(out, expect, atol=1e-4,
                                   err_msg=f"{q1} vs {q2}")


def test_degenerate_geometry_host():
    import warnings
    from aidet_tpu.data.np_rboxes import quad_overlaps_np_host
    for q1, q2, expect in _degenerate_suite():
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            out = float(quad_overlaps_np_host(q1[None], q2[None])[0, 0])
        np.testing.assert_allclose(out, expect, atol=1e-4,
                                   err_msg=f"{q1} vs {q2}")


def test_near_parallel_edges_warning_clean():
    """Quads rotated by ~1e-7 rad against each other: edge pairs are
    near-parallel (denom ~ 0), the historic overflow site."""
    import warnings
    from aidet_tpu.data.np_rboxes import quad_overlaps_np_host
    t = jnp.array([[50., 50., 30., 20., -0.3]])
    q1 = np.asarray(rboxes.thetaobb2pointobb(t))
    q2 = np.asarray(rboxes.thetaobb2pointobb(
        t + jnp.array([[0., 0., 0., 0., 1e-7]])))
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        host = float(quad_overlaps_np_host(q1, q2)[0, 0])
        dev = float(np.asarray(quad_overlaps(
            jnp.asarray(q1), jnp.asarray(q2)))[0, 0])
    np.testing.assert_allclose(host, 1.0, atol=1e-4)
    np.testing.assert_allclose(dev, 1.0, atol=1e-4)


def test_quad_overlaps_under_nested_vmap_matches_plain():
    """The rnms consumer wraps quad_overlaps in vmap(batch) x
    vmap(class); chunking must stay sequential and results identical
    to the unbatched call (the round-4 OOM was this composition)."""
    import jax

    B, C, n = 2, 3, 40
    qs = np.stack([np.stack([random_quads(n, 10 * b + c)
                             for c in range(C)])
                   for b in range(B)])  # [B, C, n, 8]
    qj = jnp.asarray(qs.reshape(B, C, n, 8))

    nested = jax.jit(jax.vmap(jax.vmap(
        lambda q: quad_overlaps(q, q))))(qj)
    for b in range(B):
        for c in range(C):
            plain = quad_overlaps(qj[b, c], qj[b, c])
            np.testing.assert_allclose(np.asarray(nested[b, c]),
                                       np.asarray(plain), atol=1e-4)
