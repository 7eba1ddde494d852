"""HBB geometry parity tests (vs. hand-computed mmdet-v1 semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from aidet_tpu.core import boxes


def test_delta2bbox_reference_values():
    # The doctest table from the reference (mmdet/core/bbox/transforms.py:66-78)
    rois = jnp.array([[0., 0., 1., 1.],
                      [0., 0., 1., 1.],
                      [0., 0., 1., 1.],
                      [5., 5., 5., 5.]])
    deltas = jnp.array([[0., 0., 0., 0.],
                        [1., 1., 1., 1.],
                        [0., 0., 2., -1.],
                        [0.7, -1.9, -0.5, 0.3]])
    out = boxes.delta2bbox(rois, deltas, max_shape=(32, 32))
    expected = np.array([[0.0000, 0.0000, 1.0000, 1.0000],
                         [0.2817, 0.2817, 4.7183, 4.7183],
                         [0.0000, 0.6321, 7.3891, 0.3679],
                         [5.8967, 2.9251, 5.5033, 3.2749]])
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-3)


def test_bbox_delta_roundtrip():
    rng = np.random.RandomState(0)
    proposals = rng.uniform(0, 500, (64, 2)).astype(np.float32)
    proposals = np.concatenate(
        [proposals, proposals + rng.uniform(5, 100, (64, 2))], -1
    ).astype(np.float32)
    # keep gt/proposal size ratios inside wh_ratio_clip so decode is lossless
    gt = proposals + rng.uniform(-20, 20, (64, 4)).astype(np.float32)
    gt[:, 2:] = np.maximum(gt[:, 2:], gt[:, :2] + 2)
    d = boxes.bbox2delta(jnp.asarray(proposals), jnp.asarray(gt))
    rec = boxes.delta2bbox(jnp.asarray(proposals), d)
    np.testing.assert_allclose(np.asarray(rec), gt, atol=1e-2)


def test_bbox_delta_means_stds_roundtrip():
    rng = np.random.RandomState(1)
    p = rng.uniform(0, 100, (16, 4)).astype(np.float32)
    p[:, 2:] += p[:, :2] + 2
    g = p + rng.uniform(-3, 3, (16, 4)).astype(np.float32)
    g[:, 2:] = np.maximum(g[:, 2:], g[:, :2] + 1)
    means, stds = (0., 0., 0., 0.), (0.1, 0.1, 0.2, 0.2)
    d = boxes.bbox2delta(jnp.asarray(p), jnp.asarray(g), means, stds)
    rec = boxes.delta2bbox(jnp.asarray(p), d, means, stds)
    np.testing.assert_allclose(np.asarray(rec), g, atol=1e-2)


def _iou_np(b1, b2):
    """Numpy oracle with legacy +1 convention (geometry.py:4-88)."""
    area1 = (b1[:, 2] - b1[:, 0] + 1) * (b1[:, 3] - b1[:, 1] + 1)
    area2 = (b2[:, 2] - b2[:, 0] + 1) * (b2[:, 3] - b2[:, 1] + 1)
    ious = np.zeros((len(b1), len(b2)))
    for i in range(len(b1)):
        xx1 = np.maximum(b1[i, 0], b2[:, 0])
        yy1 = np.maximum(b1[i, 1], b2[:, 1])
        xx2 = np.minimum(b1[i, 2], b2[:, 2])
        yy2 = np.minimum(b1[i, 3], b2[:, 3])
        inter = np.clip(xx2 - xx1 + 1, 0, None) * np.clip(yy2 - yy1 + 1, 0, None)
        ious[i] = inter / (area1[i] + area2 - inter)
    return ious


def test_bbox_overlaps_matches_numpy_oracle():
    rng = np.random.RandomState(2)
    b1 = rng.uniform(0, 200, (20, 4)).astype(np.float32)
    b1[:, 2:] += b1[:, :2]
    b2 = rng.uniform(0, 200, (30, 4)).astype(np.float32)
    b2[:, 2:] += b2[:, :2]
    out = boxes.bbox_overlaps(jnp.asarray(b1), jnp.asarray(b2))
    np.testing.assert_allclose(np.asarray(out), _iou_np(b1, b2), atol=1e-5)


def test_bbox_overlaps_aligned_and_iof():
    rng = np.random.RandomState(3)
    b = rng.uniform(0, 100, (10, 4)).astype(np.float32)
    b[:, 2:] += b[:, :2]
    self_iou = boxes.bbox_overlaps(jnp.asarray(b), jnp.asarray(b), aligned=True)
    np.testing.assert_allclose(np.asarray(self_iou), np.ones(10), atol=1e-5)
    iof = boxes.bbox_overlaps(jnp.asarray(b), jnp.asarray(b), mode="iof",
                              aligned=True)
    np.testing.assert_allclose(np.asarray(iof), np.ones(10), atol=1e-5)


def test_bbox_flip_involution():
    rng = np.random.RandomState(4)
    b = rng.uniform(0, 500, (12, 4)).astype(np.float32)
    b[:, 2:] += b[:, :2]
    shape = (600, 800)
    flipped2 = boxes.bbox_flip(boxes.bbox_flip(jnp.asarray(b), shape), shape)
    np.testing.assert_allclose(np.asarray(flipped2), b, atol=1e-4)


def test_bbox_mapping_roundtrip():
    rng = np.random.RandomState(5)
    b = rng.uniform(0, 400, (8, 4)).astype(np.float32)
    b[:, 2:] += b[:, :2]
    shape = (512, 512)
    mapped = boxes.bbox_mapping(jnp.asarray(b), shape, 1.5, True)
    back = boxes.bbox_mapping_back(mapped, shape, 1.5, True)
    np.testing.assert_allclose(np.asarray(back), b, atol=1e-3)


def test_batched_rois():
    b = jnp.arange(2 * 3 * 4, dtype=jnp.float32).reshape(2, 3, 4)
    rois = boxes.batched_rois(b)
    assert rois.shape == (6, 5)
    np.testing.assert_array_equal(np.asarray(rois[:, 0]),
                                  [0, 0, 0, 1, 1, 1])


def test_distance2bbox():
    pts = jnp.array([[10., 10.], [50., 60.]])
    dist = jnp.array([[5., 5., 5., 5.], [10., 20., 30., 40.]])
    out = boxes.distance2bbox(pts, dist)
    np.testing.assert_allclose(np.asarray(out),
                               [[5., 5., 15., 15.], [40., 40., 80., 100.]])
