"""Dataset registry + builder (parity: mmdet/datasets/builder.py:47-59)."""

from __future__ import annotations

from ..utils.registry import Registry, build_from_cfg
from .buildchange import BuildChangeDataset, CityscapesDataset
from .coco import CocoDataset
from .dota import DOTADataset
from .voc import (ConcatDataset, RepeatDataset, VOCDataset,
                  WIDERFaceDataset, XMLDataset)

DATASETS = Registry("dataset")
DATASETS.register(CocoDataset)
DATASETS.register(DOTADataset)
DATASETS.register(VOCDataset)
DATASETS.register(XMLDataset)
DATASETS.register(BuildChangeDataset)
DATASETS.register(CityscapesDataset)
DATASETS.register(WIDERFaceDataset)


def build_dataset(cfg, default_args=None):
    """Parity: datasets/builder.py:47-59 incl. wrapper configs."""
    if isinstance(cfg, dict) and cfg.get("type") == "RepeatDataset":
        return RepeatDataset(build_dataset(cfg["dataset"], default_args),
                             cfg["times"])
    if isinstance(cfg, (list, tuple)):
        return ConcatDataset([build_dataset(c, default_args) for c in cfg])
    return build_from_cfg(cfg, DATASETS, default_args)
