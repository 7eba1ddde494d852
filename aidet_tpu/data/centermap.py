"""CenterMap soft-target and weight-map synthesis.

Native replacement for the external wwtool functions the reference
pipeline uses (datasets/pipelines/loading.py:110-127, 160-230):
  - generate_centerness_image(factor, threshold): an elliptical
    "centerness" template peaking at the centre and decaying to the
    border, with values below ``threshold`` clamped to 0;
  - pointobb2pseudomask: warp that template into each OBB quad of the
    image to form the per-instance soft mask the CenterMapHead
    regresses (targets/255 — centermap_head.py:19-32);
  - the mask-weight variants (loading.py:119-128): 255-centerness
    (with_mask_weight) or centerness (with_reverse_mask_weight), both
    threshold=0, warped the same way;
  - the offline pseudo-segmentation / heatmap-weight images the
    reference loads from disk (loading.py:211-218, 226-230) — here
    synthesised directly from the OBB annotations.
"""

from __future__ import annotations

import numpy as np


def generate_centerness_image(size: int = 512, factor: float = 4.0,
                              rate: float = 0.0):
    """Centerness template in [0, 1]: 1 at the centre, →0 at edges.

    Uses the product of per-axis triangular distances raised to a
    softening exponent — matches the visual shape of the reference's
    template (a soft pyramid) without importing its code.

    ``rate`` mirrors the reference's ``centermap_rate``: template
    values below ``rate`` are clamped to 0 (wwtool's integer
    ``threshold = int(rate * 255)``), so the warped map has a hard
    support boundary inside the quad.
    """
    ax = 1.0 - np.abs(np.linspace(-1.0, 1.0, size))
    tmpl = np.outer(ax, ax)
    tmpl = np.power(tmpl, 1.0 / factor).astype(np.float32)
    if rate > 0:
        tmpl = np.where(tmpl >= rate, tmpl, 0.0).astype(np.float32)
    return tmpl


_TEMPLATE_CACHE: dict = {}


def _template(size=512, factor=4.0, rate=0.0, kind="centerness"):
    """kind: 'centerness' | 'weight' (255-centerness) | 'reverse'."""
    # weight/reverse ignore `rate` — key them without it so distinct
    # rates share one cached template (and skip the wasted base build)
    key = (size, factor, rate if kind == "centerness" else 0.0, kind)
    if key not in _TEMPLATE_CACHE:
        if kind == "weight":         # loading.py:120-123
            t = (1.0 - generate_centerness_image(size, factor, 0.0))
        elif kind == "reverse":      # loading.py:125-128
            t = generate_centerness_image(size, factor, 0.0)
        else:
            t = generate_centerness_image(size, factor, rate)
        _TEMPLATE_CACHE[key] = t.astype(np.float32)
    return _TEMPLATE_CACHE[key]


def pointobb2pseudomask(pointobb, out_hw, template_size: int = 512,
                        factor: float = 4.0, rate: float = 0.0,
                        kind: str = "centerness"):
    """Warp a template into one quad.

    Args:
      pointobb: [8] corner coords in the output image frame.
      out_hw: (H, W) of the output map.
      kind: which template — 'centerness' (soft target), 'weight'
        (255-centerness mask weight) or 'reverse'.
    Returns float32 [H, W] soft mask (0 outside the quad).
    """
    import cv2
    tmpl = _template(template_size, factor, rate, kind)
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
                        factor: float = 4.0, rate: float = 0.0,
                        kind: str = "centerness",
                        template_size: int = 512):
    """Per-instance centermaps (or weight maps) for all quads of an image.

    Args:
      pointobbs: [N, 8] quads in image coords (H, W = out_hw frame).
      mask_size: optional square resolution to rasterise at (quads are
        scaled accordingly), matching the pipeline's reduced-resolution
        gt_masks.
      kind: 'centerness' | 'weight' | 'reverse' (see pointobb2pseudomask).
    Returns [N, S, S] (or [N, H, W]) float32 soft masks in [0, 1].
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
        out[i] = pointobb2pseudomask(p, (h, w), factor=factor,
                                     rate=rate, kind=kind,
                                     template_size=template_size)
    return out


def pseudo_segmentation(pointobbs, labels, img_hw, out_size,
                        valid_hw=None, ignore_label: int = 255):
    """Class-index pseudo-segmentation from OBB annotations.

    Native replacement for the reference's offline
    ``pseudo_segmentation/`` images (loading.py:211-218 loads them from
    disk; the generator lived in external wwtool): each quad is painted
    with its 1-based class label on a 0 background; pixels outside the
    real image extent (padding) are ``ignore_label``.

    Args:
      pointobbs: [N, 8] quads in the (resized, flipped) image frame.
      labels: [N] 1-based class labels.
      img_hw: (H, W) full padded canvas extent the quads live in.
      out_size: output resolution (square) — the reference applies
        SegRescale 1/4, i.e. out_size = img_size // 4.
      valid_hw: (h, w) extent of real image content; beyond it the map
        is ignore_label.
    Returns int32 [out_size, out_size].
    """
    import cv2
    h, w = img_hw
    seg = np.zeros((out_size, out_size), np.int32)
    if valid_hw is not None:
        vh = max(1, int(round(valid_hw[0] * out_size / h)))
        vw = max(1, int(round(valid_hw[1] * out_size / w)))
        seg[vh:, :] = ignore_label
        seg[:, vw:] = ignore_label
    sy = out_size / h
    sx = out_size / w
    # paint smaller instances last so they stay visible on top
    order = np.argsort([-cv2.contourArea(
        np.asarray(p, np.float32).reshape(4, 2)) for p in pointobbs]) \
        if len(pointobbs) else []
    for i in order:
        pts = np.round(np.asarray(pointobbs[i], np.float32)
                       .reshape(4, 2) * [sx, sy]).astype(np.int32)
        cv2.fillPoly(seg, [pts], int(labels[i]))
    return seg


def heatmap_weight(pointobbs, img_hw, out_size, factor: float = 4.0):
    """Scene heatmap weight: max over instances of the warped
    centerness template (threshold 0), in [0, 1].

    Native replacement for the reference's offline ``heatmap_weight/``
    images (loading.py:226-230); the WPSGA loss applies
    ``w + 1`` so object-dense pixels weigh up to 2x
    (wpsga_head.py:180-186 with uint8 maps: w/255 + 1).
    """
    h, w = img_hw
    out = np.zeros((out_size, out_size), np.float32)
    if not len(pointobbs):
        return out
    sy = out_size / h
    sx = out_size / w
    quads = np.asarray(pointobbs, np.float32).copy()
    quads[:, 0::2] *= sx
    quads[:, 1::2] *= sy
    for p in quads:
        m = pointobb2pseudomask(p, (out_size, out_size), factor=factor)
        np.maximum(out, m, out=out)
    return out
