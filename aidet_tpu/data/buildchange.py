"""BuildChange building-roof dataset (parity: mmdet/datasets/
buildchange.py:17-392: COCO-format roof/footprint annotations with
single 'building' class; evaluation is standard COCO-style bbox/segm
via the generic eval_map machinery)."""

from __future__ import annotations

from ..core.eval.class_names import BUILDCHANGE_CLASSES
from .coco import CocoDataset


class BuildChangeDataset(CocoDataset):
    CLASSES = BUILDCHANGE_CLASSES


class CityscapesDataset(CocoDataset):
    """Cityscapes instances in COCO format (parity:
    mmdet/datasets/cityscapes.py)."""
    CLASSES = ("person", "rider", "car", "truck", "bus", "train",
               "motorcycle", "bicycle")
