"""RoIAlign tests: analytic oracle on linear ramps + routing checks."""

import jax
import jax.numpy as jnp
import numpy as np

from aidet_tpu.ops.roi_align import (roi_align, multilevel_roi_align,
                                     map_roi_levels)


def test_roi_align_constant_map():
    feat = jnp.ones((16, 16, 3)) * 5.0
    rois = jnp.asarray([[2., 2., 10., 10.], [0., 0., 15., 15.]])
    out = roi_align(feat, rois, out_size=7)
    np.testing.assert_allclose(np.asarray(out), 5.0, atol=1e-5)


def test_roi_align_linear_ramp_aligned():
    # f(x, y) = x: bilinear sampling of a linear fn is exact, so each
    # output bin must equal the x-coordinate of its sample-center mean.
    h = w = 32
    xs = jnp.arange(w, dtype=jnp.float32)
    feat = jnp.broadcast_to(xs[None, :, None], (h, w, 1))
    x1, y1, x2, y2 = 4.0, 4.0, 20.0, 20.0
    out_size, ratio = 4, 2
    out = roi_align(feat, jnp.asarray([[x1, y1, x2, y2]]),
                    out_size=out_size, sampling_ratio=ratio, aligned=True)
    bin_w = (x2 - x1) / out_size
    expected = np.array([
        (x1 - 0.5) + (b + 0.5) * bin_w for b in range(out_size)])
    np.testing.assert_allclose(np.asarray(out)[0, 0, :, 0], expected,
                               atol=1e-4)


def test_roi_align_v1_vs_v2_offset():
    h = w = 32
    xs = jnp.arange(w, dtype=jnp.float32)
    feat = jnp.broadcast_to(xs[None, :, None], (h, w, 1))
    rois = jnp.asarray([[4., 4., 20., 20.]])
    v2 = roi_align(feat, rois, out_size=4, aligned=True)
    v1 = roi_align(feat, rois, out_size=4, aligned=False)
    np.testing.assert_allclose(np.asarray(v1 - v2), 0.5, atol=1e-4)


def test_roi_align_spatial_scale():
    h = w = 16
    xs = jnp.arange(w, dtype=jnp.float32)
    feat = jnp.broadcast_to(xs[None, :, None], (h, w, 1))
    # roi in image coords, stride-4 feature
    out = roi_align(feat, jnp.asarray([[16., 16., 48., 48.]]),
                    out_size=2, spatial_scale=0.25, aligned=True)
    # feature coords: 4..12 → first bin center x = 3.5+2 = 5.5... compute:
    bin_w = (12. - 4.) / 2
    exp0 = (4 - 0.5) + 0.5 * bin_w
    np.testing.assert_allclose(float(out[0, 0, 0, 0]), exp0, atol=1e-4)


def test_roi_align_gradients_flow():
    feat = jnp.ones((8, 8, 2))
    rois = jnp.asarray([[1., 1., 6., 6.]])
    g = jax.grad(lambda f: roi_align(f, rois, out_size=2).sum())(feat)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).sum()) > 0


def test_map_roi_levels():
    # parity: single_level.py:54-73 with finest_scale=56
    rois = jnp.asarray([
        [0., 0., 10., 10.],      # tiny → level 0
        [0., 0., 111., 111.],    # scale 112 → level 1
        [0., 0., 223., 223.],    # scale 224 → level 2
        [0., 0., 447., 447.],    # scale 448 → level 3
        [0., 0., 1000., 1000.],  # huge → clamp 3
    ])
    lv = np.asarray(map_roi_levels(rois, 4))
    np.testing.assert_array_equal(lv, [0, 1, 2, 3, 3])


def test_multilevel_routing_selects_right_level():
    # put a distinct constant on each level; the output must equal the
    # constant of the level the roi maps to
    consts = [1.0, 2.0, 3.0, 4.0]
    feats = [jnp.ones((256 // s, 256 // s, 1)) * c
             for s, c in zip((4, 8, 16, 32), consts)]
    rois = jnp.asarray([
        [0., 0., 20., 20.],      # level 0
        [0., 0., 111., 111.],    # level 1
        [0., 0., 223., 223.],    # level 2
        [0., 0., 447., 447.],    # level 3 (first bin stays in-bounds)
    ])
    out = multilevel_roi_align(feats, rois, out_size=2)
    got = np.asarray(out)[:, 0, 0, 0]
    np.testing.assert_allclose(got, consts, atol=1e-5)


def test_fused_matches_masked_multilevel():
    from aidet_tpu.ops.roi_align import multilevel_roi_align_fused
    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.randn(256 // s, 256 // s, 16)
                         .astype(np.float32)) for s in (4, 8, 16, 32)]
    rois = jnp.asarray(np.stack([
        rng.uniform(0, 120, 32), rng.uniform(0, 120, 32),
        rng.uniform(130, 255, 32), rng.uniform(130, 255, 32)],
        -1).astype(np.float32))
    a = multilevel_roi_align(feats, rois, out_size=7)
    b = multilevel_roi_align_fused(feats, rois, out_size=7)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_multilevel_gradients():
    from aidet_tpu.ops.roi_align import multilevel_roi_align_fused
    feats = [jnp.ones((64 // s, 64 // s, 4)) for s in (4, 8, 16, 32)]
    rois = jnp.asarray([[4., 4., 40., 40.]])
    g = jax.grad(lambda fs: multilevel_roi_align_fused(
        fs, rois, out_size=2).sum())(feats)
    total = sum(float(jnp.abs(x).sum()) for x in g)
    assert np.isfinite(total) and total > 0


def test_batched_fused_matches_vmapped():
    from aidet_tpu.ops.roi_align import (batched_multilevel_roi_align,
                                         multilevel_roi_align_fused)
    rng = np.random.RandomState(1)
    b = 2
    feats = [jnp.asarray(rng.randn(b, 128 // s, 128 // s, 8)
                         .astype(np.float32)) for s in (4, 8, 16, 32)]
    rois = jnp.asarray(np.stack([
        rng.uniform(0, 60, (b, 16)), rng.uniform(0, 60, (b, 16)),
        rng.uniform(64, 127, (b, 16)), rng.uniform(64, 127, (b, 16))],
        -1).astype(np.float32))
    ref = jax.vmap(lambda fs, r: multilevel_roi_align_fused(
        fs, r, out_size=7))(feats, rois)
    out = batched_multilevel_roi_align(feats, rois, out_size=7)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4)


def test_multilevel_batch_of_rois_shape():
    feats = [jnp.ones((64 // s, 64 // s, 8)) for s in (4, 8, 16, 32)]
    rois = jnp.tile(jnp.asarray([[0., 0., 30., 30.]]), (12, 1))
    out = multilevel_roi_align(feats, rois, out_size=7)
    assert out.shape == (12, 7, 7, 8)
