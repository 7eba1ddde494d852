"""Mask post-processing tests: paste + mask→OBB extraction."""

import math

import numpy as np

from aidet_tpu.core.masks import (mask_crop_to_thetaobb, masks_to_thetaobbs,
                                  paste_mask)


def test_paste_mask():
    crop = np.ones((8, 8), np.float32)
    canvas = paste_mask(crop, [10, 20, 29, 39], (64, 64))
    assert canvas[20:40, 10:30].all()
    assert canvas.sum() == 20 * 20


def test_mask_to_thetaobb_axis_aligned():
    crop = np.zeros((28, 28), np.float32)
    crop[7:21, 4:24] = 1.0         # wide rect in crop coords
    box = [100., 100., 155., 155.]  # 56x56 box → scale 2x
    r = mask_crop_to_thetaobb(crop, box)
    cx, cy, w, h, theta = r
    # crop center (13.5, 13.5) → image (100 + 14*2, 100 + 14*2) = 128
    assert abs(cx - 128) < 3 and abs(cy - 128) < 3
    # extents: 20x14 crop px → 40x28 img px (sorted: rect repr may swap)
    dims = sorted([w, h])
    assert abs(dims[1] - 40) < 4 and abs(dims[0] - 28) < 4


def test_mask_to_thetaobb_rotated():
    import cv2
    crop = np.zeros((56, 56), np.float32)
    rect = (((28, 28), (40, 12), -30))
    pts = cv2.boxPoints(rect).astype(np.int32)
    cv2.fillPoly(crop, [pts], 1.0)
    r = mask_crop_to_thetaobb(crop, [0., 0., 55., 55.])
    cx, cy, w, h, theta = r
    assert abs(cx - 28) < 2 and abs(cy - 28) < 2
    dims = sorted([w, h])
    assert abs(dims[1] - 40) < 4 and abs(dims[0] - 12) < 4


def test_masks_to_thetaobbs_batch_and_empty():
    crops = np.zeros((3, 14, 14), np.float32)
    crops[0, 4:10, 2:12] = 1.0
    boxes = np.tile([0., 0., 27., 27.], (3, 1))
    valid = np.array([True, True, False])
    out = masks_to_thetaobbs(crops, boxes, valid)
    assert out.shape == (3, 5)
    assert out[0, 2] > 0          # fitted
    assert (out[1] == 0).all()    # empty mask
    assert (out[2] == 0).all()    # invalid


def test_paste_mask_box_fully_outside():
    """A box entirely off-canvas (TTA/offset-mapped) pastes nothing
    instead of raising a broadcast error."""
    crop = np.ones((8, 8), np.float32)
    for box in ((1030, 10, 1040, 50), (-40, -30, -5, -2),
                (10, 1030, 50, 1040)):
        canvas = paste_mask(crop, box, (1024, 1024))
        assert canvas.sum() == 0


def test_mask_to_thetaobb_largest_component_only():
    """Stray above-threshold pixels far from the main blob must not
    inflate the fitted OBB (largest-connected-component extraction,
    parity: wwtool segm2rbbox largest contour)."""
    crop = np.zeros((28, 28), np.float32)
    crop[4:12, 4:20] = 1.0          # main blob: 16x8
    crop[26, 26] = 1.0              # stray pixel in the far corner
    box = (0.0, 0.0, 27.0, 27.0)
    obb = mask_crop_to_thetaobb(crop, box)
    assert obb is not None
    _, _, w, h, _ = obb
    assert max(w, h) < 20, (w, h)   # would be ~32 if the stray counted
