"""OBB geometry tests: round-trips, cv2 ground truth, flip invariants.

The reference has essentially no unit tests for its OBB math
(SURVEY.md §4.7); these property tests are the new regression net.
"""

import math

import cv2
import jax.numpy as jnp
import numpy as np

from aidet_tpu.core import rboxes
from aidet_tpu.core.riou import min_area_rect_np, quad_areas

HALF_PI = math.pi / 2


def random_thetaobbs(n, seed=0):
    rng = np.random.RandomState(seed)
    cx = rng.uniform(50, 450, n)
    cy = rng.uniform(50, 450, n)
    w = rng.uniform(10, 120, n)
    h = rng.uniform(10, 120, n)
    theta = rng.uniform(-HALF_PI + 1e-3, -1e-3, n)
    return np.stack([cx, cy, w, h, theta], -1).astype(np.float32)


def _corner_set_close(p1, p2, atol=1e-2):
    """Compare two 8-vectors as unordered corner sets."""
    a = np.sort(p1.reshape(4, 2), axis=0)
    b = np.sort(p2.reshape(4, 2), axis=0)
    np.testing.assert_allclose(a, b, atol=atol)


def test_thetaobb2pointobb_matches_cv2_boxpoints():
    for t in random_thetaobbs(20, seed=1):
        ours = np.asarray(rboxes.thetaobb2pointobb(jnp.asarray(t)))
        ref = cv2.boxPoints(((float(t[0]), float(t[1])),
                             (float(t[2]), float(t[3])),
                             float(t[4]) * 180 / math.pi)).reshape(-1)
        np.testing.assert_allclose(ours, ref, atol=1e-2)


def test_pointobb2thetaobb_roundtrip():
    t = random_thetaobbs(64, seed=2)
    p = rboxes.thetaobb2pointobb(jnp.asarray(t))
    t2 = np.asarray(rboxes.pointobb2thetaobb(p))
    # same geometry: compare via corner sets (w/h/theta representation
    # may differ by a quarter-turn only if w == h)
    p2 = np.asarray(rboxes.thetaobb2pointobb(jnp.asarray(t2)))
    for a, b in zip(np.asarray(p), p2):
        _corner_set_close(a, b)
    # area must match exactly
    np.testing.assert_allclose(t2[:, 2] * t2[:, 3], t[:, 2] * t[:, 3],
                               rtol=1e-4)


def test_pointobb2thetaobb_matches_minarearect_geometry():
    rng = np.random.RandomState(3)
    for _ in range(20):
        quad = rboxes.thetaobb2pointobb(jnp.asarray(random_thetaobbs(1, rng.randint(1 << 30))[0]))
        quad_np = np.asarray(quad).reshape(4, 2)
        ours = np.asarray(rboxes.pointobb2thetaobb(quad.reshape(8)))
        (rcx, rcy), (rw, rh), rang = cv2.minAreaRect(quad_np.astype(np.float32))
        np.testing.assert_allclose(ours[0], rcx, atol=0.1)
        np.testing.assert_allclose(ours[1], rcy, atol=0.1)
        np.testing.assert_allclose(ours[2] * ours[3], rw * rh, rtol=1e-3)


def test_min_area_rect_np_matches_cv2():
    rng = np.random.RandomState(4)
    for _ in range(20):
        pts = rng.uniform(0, 200, (rng.randint(3, 40), 2)).astype(np.float32)
        cx, cy, w, h, theta = min_area_rect_np(pts)
        (rcx, rcy), (rw, rh), rang = cv2.minAreaRect(pts)
        np.testing.assert_allclose(w * h, rw * rh, rtol=1e-3)
        np.testing.assert_allclose([cx, cy], [rcx, rcy], atol=0.5)


def test_best_point_sort_idempotent_and_cyclic_invariant():
    t = random_thetaobbs(32, seed=5)
    p = rboxes.thetaobb2pointobb(jnp.asarray(t))
    sorted_once = rboxes.pointobb_best_point_sort(p)
    sorted_twice = rboxes.pointobb_best_point_sort(sorted_once)
    np.testing.assert_allclose(np.asarray(sorted_once),
                               np.asarray(sorted_twice), atol=1e-4)
    for s in range(4):
        rolled = jnp.roll(p, 2 * s, axis=-1)
        out = rboxes.pointobb_best_point_sort(rolled)
        np.testing.assert_allclose(np.asarray(out), np.asarray(sorted_once),
                                   atol=1e-4)


def test_extreme_sort_top_point_first():
    t = random_thetaobbs(32, seed=6)
    p = np.asarray(rboxes.pointobb_extreme_sort(
        rboxes.thetaobb2pointobb(jnp.asarray(t))))
    ys = p[:, 1::2]
    assert (p[:, 1] <= ys.min(-1) + 1e-4).all()


def test_hobb_roundtrip():
    t = random_thetaobbs(32, seed=7)
    hobb = rboxes.thetaobb2hobb(jnp.asarray(t))
    p = rboxes.hobb2pointobb(hobb)
    # reconstructed quad must cover the same region
    t2 = np.asarray(rboxes.pointobb2thetaobb(p))
    np.testing.assert_allclose(t2[:, 2] * t2[:, 3], t[:, 2] * t[:, 3],
                               rtol=1e-3)
    np.testing.assert_allclose(t2[:, 0], t[:, 0], atol=0.5)
    np.testing.assert_allclose(t2[:, 1], t[:, 1], atol=0.5)


def test_hobb_rolls_equivalent_and_canonical():
    """hobb_rolls slot 0 is the input; every roll decodes to the same
    rectangle (same corner set), so min-over-rolls regression targets
    are geometry-preserving."""
    t = random_thetaobbs(32, seed=11)
    hobb = rboxes.thetaobb2hobb(jnp.asarray(t))
    rolls = rboxes.hobb_rolls(hobb)                     # [N, 4, 5]
    np.testing.assert_allclose(np.asarray(rolls[:, 0]),
                               np.asarray(hobb), rtol=1e-4, atol=1e-3)
    base = np.sort(np.asarray(
        rboxes.hobb2pointobb(hobb)).reshape(-1, 4, 2), axis=1)
    for k in range(1, 4):
        pk = np.asarray(rboxes.hobb2pointobb(rolls[:, k]))
        np.testing.assert_allclose(
            np.sort(pk.reshape(-1, 4, 2), axis=1), base,
            rtol=1e-3, atol=0.1)


def test_thetaobb_delta_roundtrip():
    t = random_thetaobbs(64, seed=8)
    rng = np.random.RandomState(8)
    rois = rng.uniform(0, 400, (64, 4)).astype(np.float32)
    rois[:, 2:] += rois[:, :2] + 10
    d = rboxes.thetaobb2delta(jnp.asarray(rois), jnp.asarray(t))
    rec = np.asarray(rboxes.delta2thetaobb(jnp.asarray(rois), d))
    np.testing.assert_allclose(rec[:, :2], t[:, :2], atol=1e-2)
    # reference parity: the decode pair returns w+1/h+1 (legacy offset
    # baked into transforms.py:321-395); consumers subtract it downstream
    np.testing.assert_allclose(rec[:, 2:4], t[:, 2:4] + 1.0, rtol=1e-3)
    np.testing.assert_allclose(rec[:, 4], t[:, 4], atol=1e-4)


def test_thetaobb_delta_roundtrip_decodes_plus_one():
    # decode returns gw = gt_w + 1 (legacy convention); encode/decode must
    # compose to w+1 exactly like the reference pair (transforms.py:321-395)
    t = random_thetaobbs(8, seed=9)
    rois = np.asarray(rboxes.thetaobb2bbox(jnp.asarray(t)))
    d = rboxes.thetaobb2delta(jnp.asarray(rois), jnp.asarray(t))
    rec = np.asarray(rboxes.delta2thetaobb(jnp.asarray(rois), d))
    np.testing.assert_allclose(rec[:, 2], t[:, 2] + 1.0, rtol=1e-4)


def test_pointobb_delta_roundtrip():
    t = random_thetaobbs(64, seed=10)
    p = np.asarray(rboxes.thetaobb2pointobb(jnp.asarray(t)))
    rng = np.random.RandomState(10)
    rois = rng.uniform(0, 400, (64, 4)).astype(np.float32)
    rois[:, 2:] += rois[:, :2] + 10
    d = rboxes.pointobb2delta(jnp.asarray(rois), jnp.asarray(p))
    rec = np.asarray(rboxes.delta2pointobb(jnp.asarray(rois), d))
    np.testing.assert_allclose(rec, p, atol=1e-2)


def test_hobb_delta_roundtrip():
    t = random_thetaobbs(64, seed=11)
    hobb = np.asarray(rboxes.thetaobb2hobb(jnp.asarray(t)))
    rng = np.random.RandomState(11)
    rois = rng.uniform(0, 400, (64, 4)).astype(np.float32)
    rois[:, 2:] += rois[:, :2] + 10
    d = rboxes.hobb2delta(jnp.asarray(rois), jnp.asarray(hobb))
    rec = np.asarray(rboxes.delta2hobb(jnp.asarray(rois), d))
    np.testing.assert_allclose(rec[:, :4], hobb[:, :4], atol=1e-2)
    np.testing.assert_allclose(rec[:, 4], hobb[:, 4] + 1.0, rtol=1e-3)


def test_multiclass_grouped_decode():
    # deltas laid out [..., K*5] per class, rois broadcast per group
    t = random_thetaobbs(16, seed=12)
    rois = np.asarray(rboxes.thetaobb2bbox(jnp.asarray(t)))
    d = np.asarray(rboxes.thetaobb2delta(jnp.asarray(rois), jnp.asarray(t)))
    d3 = np.concatenate([d, d, d], axis=-1)
    rec = np.asarray(rboxes.delta2thetaobb(jnp.asarray(rois), jnp.asarray(d3)))
    assert rec.shape == (16, 15)
    np.testing.assert_allclose(rec[:, 0:5], rec[:, 5:10], atol=1e-5)


def test_thetaobb_flip_preserves_geometry():
    t = random_thetaobbs(32, seed=13)
    shape = (512, 512)
    flipped = np.asarray(rboxes.thetaobb_flip(jnp.asarray(t), shape))
    # mirrored center, same area
    np.testing.assert_allclose(flipped[:, 0], shape[1] - t[:, 0] - 1, atol=1e-3)
    np.testing.assert_allclose(flipped[:, 2] * flipped[:, 3],
                               t[:, 2] * t[:, 3], rtol=1e-5)
    # double flip restores geometry (corner sets)
    f2 = rboxes.thetaobb_flip(jnp.asarray(flipped), shape)
    p0 = np.asarray(rboxes.thetaobb2pointobb(jnp.asarray(t)))
    p2 = np.asarray(rboxes.thetaobb2pointobb(f2))
    for a, b in zip(p0, p2):
        _corner_set_close(a, b)


def test_pointobb_flip_involution():
    t = random_thetaobbs(32, seed=14)
    p = rboxes.pointobb_best_point_sort(
        rboxes.thetaobb2pointobb(jnp.asarray(t)))
    shape = (512, 512)
    f2 = rboxes.pointobb_flip(rboxes.pointobb_flip(p, shape), shape)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(p), atol=1e-2)


def test_pointobb_flip_mirrors_geometry():
    t = random_thetaobbs(16, seed=15)
    p = rboxes.thetaobb2pointobb(jnp.asarray(t))
    shape = (512, 512)
    f = np.asarray(rboxes.pointobb_flip(p, shape))
    # areas preserved
    np.testing.assert_allclose(np.asarray(quad_areas(f)),
                               np.asarray(quad_areas(p)), rtol=1e-4)
    # x centroid mirrored
    np.testing.assert_allclose(f[:, 0::2].mean(-1),
                               shape[1] - np.asarray(p)[:, 0::2].mean(-1) - 1,
                               atol=1e-2)


def test_hobb_flip_preserves_geometry():
    t = random_thetaobbs(16, seed=16)
    hobb = rboxes.thetaobb2hobb(jnp.asarray(t))
    shape = (512, 512)
    f = np.asarray(rboxes.hobb_flip(hobb, shape))
    p_f = rboxes.hobb2pointobb(jnp.asarray(f))
    p_0 = rboxes.hobb2pointobb(hobb)
    np.testing.assert_allclose(np.asarray(quad_areas(p_f)),
                               np.asarray(quad_areas(p_0)), rtol=1e-2)


def test_rescale():
    t = random_thetaobbs(8, seed=17)
    s = np.asarray(rboxes.thetaobb_rescale(jnp.asarray(t), 2.0))
    np.testing.assert_allclose(s[:, :4], t[:, :4] * 2)
    np.testing.assert_allclose(s[:, 4], t[:, 4])
    back = np.asarray(rboxes.thetaobb_rescale(jnp.asarray(s), 2.0, reverse=True))
    np.testing.assert_allclose(back, t, rtol=1e-5)


def test_pointobb_flip_extreme_sort_variant():
    import numpy as np
    import jax.numpy as jnp
    from aidet_tpu.core.rboxes import pointobb_flip

    pts = jnp.asarray([[10., 20., 50., 22., 48., 60., 8., 58.]])
    shape = (100, 100)
    # extreme branch: mirror + swap points 2<->4, no re-sort
    # (reference rbbox/transforms.py:214-219)
    got = np.asarray(pointobb_flip(pts, shape, sort_method="extreme"))[0]
    w = shape[1]
    exp = np.asarray([w - 10 - 1, 20., w - 8 - 1, 58., w - 48 - 1, 60.,
                      w - 50 - 1, 22.])
    np.testing.assert_allclose(got, exp)
    # both variants describe the same quad (as point sets)
    best = np.asarray(pointobb_flip(pts, shape))[0]
    assert (set(map(tuple, got.reshape(4, 2)))
            == set(map(tuple, best.reshape(4, 2))))


def test_full_chain_roundtrip_iou_all_encodings():
    """pointobb → encode (delta vs perfect hbb proposal) → decode →
    quad: rotated IoU vs the original must stay high for every
    encoding — the codec-side floor on achievable OBB precision
    (ROUND2_NOTES hobb diagnosis)."""
    import jax
    from aidet_tpu.core import rboxes as R
    from aidet_tpu.core.riou import quad_overlaps

    rs = np.random.RandomState(0)
    n = 64
    cx, cy = rs.uniform(100, 400, (2, n))
    w = rs.uniform(20, 120, n)
    h = w * rs.uniform(0.3, 0.9, n)
    th = rs.uniform(0, np.pi, n)
    quads = jnp.asarray(np.asarray(
        [cv2.boxPoints(((cx[i], cy[i]), (w[i], h[i]),
                        np.degrees(th[i]))).reshape(-1)
         for i in range(n)], np.float32))
    hbb = R.pointobb2bbox(quads)

    def chain_iou(enc):
        if enc == "thetaobb":
            g = R.pointobb2thetaobb(quads)
            back = R.delta2thetaobb(hbb, R.thetaobb2delta(hbb, g))
            bq = R.thetaobb2pointobb(back)
        elif enc == "hobb":
            g = R.pointobb2hobb(quads)
            back = R.delta2hobb(hbb, R.hobb2delta(hbb, g))
            bq = R.hobb2pointobb(back)
        else:
            g = R.pointobb_best_point_sort(quads)
            back = R.delta2pointobb(hbb, R.pointobb2delta(hbb, g))
            bq = back
        return np.asarray(jax.vmap(
            lambda a, b: quad_overlaps(a[None], b[None])[0, 0])(
            quads, bq))

    for enc, floor in (("thetaobb", 0.8), ("pointobb", 0.95),
                       ("hobb", 0.85)):
        iou = chain_iou(enc)
        assert iou.min() > floor, (enc, float(iou.min()))
