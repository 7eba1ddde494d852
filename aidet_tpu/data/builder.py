"""Dataset registry + builder (parity: mmdet/datasets/builder.py:47-59)."""

from __future__ import annotations

from ..utils.registry import Registry, build_from_cfg
from .coco import CocoDataset
from .dota import DOTADataset

DATASETS = Registry("dataset")
DATASETS.register(CocoDataset)
DATASETS.register(DOTADataset)


def build_dataset(cfg, default_args=None):
    return build_from_cfg(cfg, DATASETS, default_args)
