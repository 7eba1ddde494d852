"""Model registries (parity: mmdet/models/registry.py:3-9)."""

from ..utils.registry import Registry

BACKBONES = Registry("backbone")
NECKS = Registry("neck")
ROI_EXTRACTORS = Registry("roi_extractor")
SHARED_HEADS = Registry("shared_head")
HEADS = Registry("head")
LOSSES = Registry("loss")
DETECTORS = Registry("detector")
