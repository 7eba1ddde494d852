"""Data pipeline tests: transforms, centermap synthesis, loader."""

import json
import os

import numpy as np
import pytest

from aidet_tpu.data.centermap import (generate_centerness_image,
                                      pointobb2pseudomask,
                                      pointobbs2centermap)
from aidet_tpu.data.pipeline import (TestPipeline, TrainPipeline,
                                     collate_batch, normalize_image,
                                     rasterize_polygons, resize_keep_ratio)


def _fake_anns(n=3, img=256, seed=0):
    rng = np.random.RandomState(seed)
    cx, cy = rng.uniform(60, img - 60, (2, n))
    w, h = rng.uniform(20, 50, (2, n))
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                     -1).astype(np.float32)
    th = rng.uniform(-1.4, -0.1, n)
    pts = []
    for i in range(n):
        c, s = np.cos(th[i]), np.sin(th[i])
        d = np.array([[-w[i] / 2, -h[i] / 2], [w[i] / 2, -h[i] / 2],
                      [w[i] / 2, h[i] / 2], [-w[i] / 2, h[i] / 2]])
        R = np.array([[c, -s], [s, c]])
        pts.append((d @ R.T + [cx[i], cy[i]]).reshape(-1))
    return dict(bboxes=boxes,
                labels=rng.randint(1, 16, n).astype(np.int32),
                pointobbs=np.asarray(pts, np.float32),
                bboxes_ignore=np.zeros((0, 4), np.float32),
                segmentations=[None] * n)


def test_resize_keep_ratio():
    img = np.zeros((200, 400, 3), np.uint8)
    out, scale = resize_keep_ratio(img, 100)
    assert out.shape[:2] == (50, 100)
    assert abs(scale - 0.25) < 1e-6


def test_normalize_roundtrip_stats():
    img = (np.ones((8, 8, 3)) * [103.53, 116.28, 123.675]).astype(np.uint8)
    out = normalize_image(img)  # BGR→RGB then standardize
    assert np.abs(out).max() < 0.1


def test_train_pipeline_shapes_and_padding():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (256, 256, 3), np.uint8)
    pipe = TrainPipeline(img_size=128, max_gt=8, flip_ratio=0.0,
                         with_rbox=True, with_mask=True, mask_type="binary")
    s = pipe(img, _fake_anns())
    assert s["imgs"].shape == (128, 128, 3)
    assert s["gt_boxes"].shape == (8, 4)
    assert s["gt_valid"].sum() == 3
    assert s["gt_rboxes"].shape == (8, 5)
    assert s["gt_masks"].shape[0] == 8
    # boxes scaled by 0.5
    assert s["gt_boxes"][:3].max() <= 128


def test_train_pipeline_flip_consistency():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (128, 128, 3), np.uint8)
    pipe = TrainPipeline(img_size=128, max_gt=8, flip_ratio=1.0,
                         with_rbox=True)
    anns = _fake_anns(img=128, seed=1)
    s = pipe(img, anns)
    # flipped hbb must still be inside the image and ordered
    b = s["gt_boxes"][:3]
    assert (b[:, 2] >= b[:, 0]).all() and (b[:, 0] >= -1).all()
    # rbox centers mirrored
    np.testing.assert_allclose(
        s["gt_rboxes"][:3, 0],
        128 - 1 - (anns["bboxes"][:, 0] + anns["bboxes"][:, 2]) / 2,
        atol=2.0)


def test_test_pipeline():
    img = np.zeros((200, 300, 3), np.uint8)
    pipe = TestPipeline(img_size=128)
    s = pipe(img)
    assert s["imgs"].shape == (128, 128, 3)
    assert abs(float(s["scale_factors"]) - 128 / 300) < 1e-6


def test_collate_batch():
    pipe = TestPipeline(img_size=64)
    samples = [pipe(np.zeros((64, 64, 3), np.uint8)) for _ in range(3)]
    batch = collate_batch(samples)
    assert batch["imgs"].shape == (3, 64, 64, 3)


def test_centerness_template():
    t = generate_centerness_image(64)
    assert t.shape == (64, 64)
    assert t.max() <= 1.0 and t.min() >= 0.0
    # peak in the middle, zero at the corner
    assert t[32, 32] > 0.95
    assert t[0, 0] < 1e-6


def test_pseudomask_peak_at_obb_center():
    quad = np.array([40., 20., 80., 40., 70., 60., 30., 40.])
    m = pointobb2pseudomask(quad, (100, 100))
    cy, cx = np.unravel_index(np.argmax(m), m.shape)
    # center of the quad ≈ (55, 40)
    assert abs(cx - 55) < 6 and abs(cy - 40) < 6
    # outside the quad → 0
    assert m[90, 90] == 0.0


def test_pseudomask_batch_and_scaling():
    quads = np.array([[10., 10., 50., 10., 50., 30., 10., 30.],
                      [60., 60., 90., 60., 90., 90., 60., 90.]])
    out = pointobbs2centermap(quads, (100, 100), mask_size=50)
    assert out.shape == (2, 50, 50)
    assert out[0].max() > 0.9
    # first instance occupies the upper-left quadrant at half scale
    assert out[0][:20, 5:25].max() > 0.5
    assert out[0][30:, 30:].max() == 0.0


def test_rasterize_polygons():
    quads = np.array([[0., 0., 50., 0., 50., 50., 0., 50.]])
    m = rasterize_polygons(quads, (100, 100), 50)
    assert m.shape == (1, 50, 50)
    assert m[0][:24, :24].mean() > 0.9
    assert m[0][30:, 30:].mean() < 0.05
