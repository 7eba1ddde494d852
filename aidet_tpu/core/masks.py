"""Mask post-processing: paste roi masks into image frame and extract
oriented boxes from masks.

Host-side (numpy) equivalents of:
  - FCNMaskHead.get_seg_masks (mmdet/models/mask_heads/fcn_mask_head.py:
    142-208): resize each roi's SxS mask crop into its box, threshold,
    paste into the full image canvas;
  - the wwtool segm2rbbox used by DOTADataset.segm2txt
    (mmdet/datasets/dota.py:160-196): predicted mask → largest
    component's min-area rect (MaskOBB's OBB extraction) — rebuilt on
    our rotating-calipers min_area_rect_np.
"""

from __future__ import annotations

import numpy as np

from .riou import min_area_rect_np


def paste_mask(mask_crop: np.ndarray, box, img_hw, thr: float = 0.5):
    """Resize an SxS mask crop into `box` on an (H, W) canvas."""
    import cv2
    h, w = img_hw
    x1, y1, x2, y2 = [int(round(float(v))) for v in box[:4]]
    canvas = np.zeros((h, w), np.uint8)
    # a box entirely outside the canvas (possible for TTA/offset-mapped
    # boxes) pastes nothing instead of raising a broadcast error
    if x2 < 0 or y2 < 0 or x1 > w - 1 or y1 > h - 1:
        return canvas
    x1, y1 = max(x1, 0), max(y1, 0)
    x2, y2 = min(x2, w - 1), min(y2, h - 1)
    bw, bh = max(x2 - x1 + 1, 1), max(y2 - y1 + 1, 1)
    resized = cv2.resize(mask_crop.astype(np.float32), (bw, bh))
    canvas[y1:y1 + bh, x1:x1 + bw] = (resized > thr).astype(np.uint8)
    return canvas


def mask_crop_to_thetaobb(mask_crop: np.ndarray, box, thr: float = 0.5):
    """OBB of a predicted roi mask, in image coords.

    Works directly on the SxS crop (no full-image paste): threshold,
    take the largest 4-connected blob's pixels, min-area rect in crop
    coords, then affine-map to the box frame.

    Returns (cx, cy, w, h, theta) or None if the mask is empty.
    """
    s_h, s_w = mask_crop.shape
    binary = mask_crop > thr
    if not binary.any():
        return None
    # largest 4-connected blob (parity: wwtool segm2rbbox fits the
    # LARGEST contour) — stray above-threshold pixels in a far corner
    # would otherwise inflate the min-area rect unboundedly
    import cv2
    n_lbl, lbl, stats, _ = cv2.connectedComponentsWithStats(
        binary.astype(np.uint8), connectivity=4)
    if n_lbl > 2:
        best = 1 + int(np.argmax(stats[1:, cv2.CC_STAT_AREA]))
        binary = lbl == best
    ys, xs = np.nonzero(binary)
    x1, y1, x2, y2 = [float(v) for v in box[:4]]
    sx = max(x2 - x1 + 1, 1.0) / s_w
    sy = max(y2 - y1 + 1, 1.0) / s_h
    # map blob pixels into image coords FIRST (anisotropic box scaling
    # would bend a rect fitted in crop coords), then fit the rect there
    pts = np.stack([x1 + (xs + 0.5) * sx,
                    y1 + (ys + 0.5) * sy], -1).astype(np.float64)
    cx, cy, w, h, theta = min_area_rect_np(pts)
    return float(cx), float(cy), float(w), float(h), float(theta)


def masks_to_thetaobbs(mask_crops, boxes, valid=None, thr: float = 0.5):
    """Batch version over [K, S, S] crops + [K, 4+] boxes.

    Returns [K, 5] thetaobbs with zero rows where the mask was empty or
    the slot invalid.
    """
    k = len(mask_crops)
    out = np.zeros((k, 5), np.float32)
    for i in range(k):
        if valid is not None and not valid[i]:
            continue
        r = mask_crop_to_thetaobb(np.asarray(mask_crops[i]),
                                  np.asarray(boxes[i]), thr)
        if r is not None:
            out[i] = r
    return out
