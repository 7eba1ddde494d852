"""CenterMap soft-target synthesis.

Native replacement for the external wwtool pair used by the reference
(datasets/pipelines/loading.py:110-127, 160-178):
  - generate_centerness_image: an elliptical-gaussian-like "centerness"
    template peaking at the centre and decaying to the border;
  - pointobb2pseudomask: warp that template into each OBB quad of the
    image to form the per-instance soft mask the CenterMapHead
    regresses (targets/255 — centermap_head.py:19-32).
"""

from __future__ import annotations

import numpy as np


def generate_centerness_image(size: int = 512, factor: float = 4.0):
    """Centerness template in [0, 1]: 1 at the centre, →0 at edges.

    Uses the product of per-axis triangular distances raised to a
    softening exponent — matches the visual shape of the reference's
    template (a soft pyramid) without importing its code.
    """
    ax = 1.0 - np.abs(np.linspace(-1.0, 1.0, size))
    tmpl = np.outer(ax, ax)
    return np.power(tmpl, 1.0 / factor).astype(np.float32)


_TEMPLATE_CACHE: dict = {}


def _template(size=512, factor=4.0):
    key = (size, factor)
    if key not in _TEMPLATE_CACHE:
        _TEMPLATE_CACHE[key] = generate_centerness_image(size, factor)
    return _TEMPLATE_CACHE[key]


def pointobb2pseudomask(pointobb, out_hw, template_size: int = 512,
                        factor: float = 4.0):
    """Warp the centerness template into one quad.

    Args:
      pointobb: [8] corner coords in the output image frame.
      out_hw: (H, W) of the output map.
    Returns float32 [H, W] soft mask (0 outside the quad).
    """
    import cv2
    tmpl = _template(template_size, factor)
    s = template_size - 1
    src = np.array([[0, 0], [s, 0], [s, s], [0, s]], np.float32)
    dst = np.asarray(pointobb, np.float32).reshape(4, 2)
    m = cv2.getPerspectiveTransform(src, dst)
    h, w = out_hw
    return cv2.warpPerspective(tmpl, m, (w, h),
                               flags=cv2.INTER_LINEAR,
                               borderMode=cv2.BORDER_CONSTANT,
                               borderValue=0.0)


def pointobbs2centermap(pointobbs, out_hw, mask_size: int | None = None,
                        factor: float = 4.0):
    """Per-instance centermaps for all quads of an image.

    Args:
      pointobbs: [N, 8] quads in image coords (H, W = out_hw frame).
      mask_size: optional square resolution to rasterise at (quads are
        scaled accordingly), matching the pipeline's reduced-resolution
        gt_masks.
    Returns [N, S, S] (or [N, H, W]) float32 soft masks.
    """
    h, w = out_hw
    if mask_size is not None:
        sx, sy = mask_size / w, mask_size / h
        pointobbs = np.asarray(pointobbs, np.float32).copy()
        pointobbs[:, 0::2] *= sx
        pointobbs[:, 1::2] *= sy
        h = w = mask_size
    out = np.zeros((len(pointobbs), h, w), np.float32)
    for i, p in enumerate(pointobbs):
        out[i] = pointobb2pseudomask(p, (h, w), factor=factor)
    return out
