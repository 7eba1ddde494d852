"""Test-time augmentation: multi-scale + flip inference with merged
detections.

Parity target: MultiScaleFlipAug (datasets/pipelines/test_aug.py:8-38)
+ the aug-merging helpers (core/post_processing/merge_augs.py) +
aug_test routing (detectors/base.py:97-134).  Detections from each
(scale, flip) variant are mapped back to original-image coordinates
and fused with per-class NMS — the det-level merge used by the
single-stage aug path.
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from ..core import rboxes as R
from ..data.pipeline import TestPipeline
from ..data.tiling import merge_patch_detections


def flip_boxes_back(boxes, img_w):
    """Single source for the flip convention: core.boxes.bbox_flip
    (a second copy of the 'w - x - 1' math could drift)."""
    from ..core.boxes import bbox_flip
    return np.asarray(bbox_flip(boxes, (0, img_w)))


def aug_test_image(model, variables, img, scales=(1024,),
                   flip: bool = True, iou_thr: float = 0.5,
                   num_classes: int = 15, rbox_encode: str | None = None):
    """Run (scales × {id, flip}) inference on one BGR image and merge.

    Returns dict(boxes, scores, labels [+quads]) in original coords.
    """
    import cv2
    import jax.numpy as jnp

    from .inference import _jitted_predict
    predict = _jitted_predict(model)  # shared cache: no per-call retrace
    h0, w0 = img.shape[:2]

    variants = []
    for s in scales:
        for f in ([False, True] if flip else [False]):
            variants.append((s, f))

    dets = []
    for s, f in variants:
        pipe = TestPipeline(img_size=s)
        im = img[:, ::-1] if f else img
        sample = pipe(np.ascontiguousarray(im))
        out = predict(variables, sample["imgs"][None],
                      sample["img_shapes"][None],
                      np.asarray([sample["scale_factors"]], np.float32))
        out = jax.device_get(out)
        v = out["valid"][0]
        raw_boxes = out["boxes"][0][v]
        boxes = flip_boxes_back(raw_boxes, w0) if f else raw_boxes
        det = dict(boxes=boxes, scores=out["scores"][0][v],
                   labels=out["labels"][0][v],
                   valid=np.ones(int(v.sum()), bool))
        quads = None
        if rbox_encode is not None and "rboxes" in out:
            rb = out["rboxes"][0][v]
            quads = np.asarray(
                R.RBBOX_CODECS[rbox_encode][3](jnp.asarray(rb)))
        elif "masks" in out:
            # mask-emitting OBB models (MaskOBB / CenterMapOBB): each
            # variant's OBB comes from its predicted masks via
            # min-area-rect (datasets/dota.py:160-196 segm2txt parity).
            # Crops are roi-relative, so paste against the PRE-flip-back
            # boxes and flip the resulting quads instead.
            from ..core.masks import masks_to_thetaobbs
            tobbs = masks_to_thetaobbs(out["masks"][0][v], raw_boxes)
            quads = np.asarray(R.thetaobb2pointobb(jnp.asarray(tobbs)))
        if quads is not None:
            if f:
                quads = np.asarray(R.pointobb_flip(
                    jnp.asarray(quads), (h0, w0)))
            det["quads"] = quads
        dets.append(det)

    merged = merge_patch_detections(
        [dict(d, boxes=d["boxes"]) for d in dets],
        np.zeros((len(dets), 2), np.float32),
        num_classes=num_classes, iou_thr=iou_thr, box_type="box")

    out = dict(merged)
    if any("quads" in d for d in dets):
        # fuse quads through the same per-class NMS on their own merge
        qdets = [dict(boxes=d["quads"], scores=d["scores"],
                      labels=d["labels"], valid=d["valid"])
                 for d in dets if "quads" in d]
        qm = merge_patch_detections(
            qdets, np.zeros((len(qdets), 2), np.float32),
            num_classes=num_classes, iou_thr=iou_thr, box_type="quad")
        out["quads"] = qm["boxes"]
        out["quad_scores"] = qm["scores"]
        out["quad_labels"] = qm["labels"]
    return out
