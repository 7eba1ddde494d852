"""Albumentations wrapper (parity: pipelines/transforms.py:865-1010 Albu).

Optional-dependency style: constructing :class:`AlbuTransform` without
`albumentations` installed raises immediately with a clear message (no
silent identity fallback — the round-1 InstaBoost lesson).
"""

from __future__ import annotations

import numpy as np


def _albu_builder(cfg, albumentations):
    """{'type': 'ShiftScaleRotate', ...} → albumentations transform
    (transforms.py:915-945)."""
    args = dict(cfg)
    obj_type = args.pop("type")
    cls = (getattr(albumentations, obj_type)
           if isinstance(obj_type, str) else obj_type)
    if "transforms" in args:
        args["transforms"] = [_albu_builder(t, albumentations)
                              for t in args["transforms"]]
    return cls(**args)


class AlbuTransform:
    """Apply an albumentations pipeline to (img, boxes, labels,
    pointobbs).

    Boxes ride albumentations' pascal_voc bbox protocol; pointobbs ride
    the keypoint protocol (4 keypoints per box, 'xy' format) so rotated
    annotations survive geometric transforms. Instances whose box is
    dropped by the transform are filtered from every field.
    """

    def __init__(self, transforms, min_visibility: float = 0.1):
        try:
            import albumentations
        except ImportError as e:
            raise ImportError(
                "AlbuTransform requires the `albumentations` package; "
                "install it or remove the `albu` entry from "
                "train_pipeline") from e
        self._albu = albumentations
        self.aug = albumentations.Compose(
            [_albu_builder(t, albumentations) for t in transforms],
            bbox_params=albumentations.BboxParams(
                format="pascal_voc", label_fields=["idx"],
                min_visibility=min_visibility),
            keypoint_params=albumentations.KeypointParams(
                format="xy", remove_invisible=False),
        )

    def __call__(self, img, boxes, labels, pointobbs=None):
        n = len(boxes)
        kps = (np.asarray(pointobbs, np.float32).reshape(-1, 2)
               if pointobbs is not None and len(pointobbs)
               else np.zeros((0, 2), np.float32))
        h, w = img.shape[:2]
        safe = np.stack([
            np.clip(boxes[:, 0], 0, w - 2),
            np.clip(boxes[:, 1], 0, h - 2),
            np.clip(boxes[:, 2], 1, w - 1),
            np.clip(boxes[:, 3], 1, h - 1)], -1) if n else boxes
        res = self.aug(image=img, bboxes=[tuple(b) for b in safe],
                       idx=list(range(n)),
                       keypoints=[tuple(k) for k in kps])
        img = res["image"]
        keep = np.asarray(res["idx"], np.int64)
        new_boxes = (np.asarray(res["bboxes"], np.float32)
                     .reshape(-1, 4))
        labels = np.asarray(labels)[keep] if n else labels
        out_pobbs = None
        if pointobbs is not None and len(pointobbs):
            out_pobbs = (np.asarray(res["keypoints"], np.float32)
                         .reshape(-1, 8)[keep])
        return img, new_boxes, labels, out_pobbs
