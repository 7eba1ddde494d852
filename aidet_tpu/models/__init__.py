from .registry import (BACKBONES, DETECTORS, HEADS, LOSSES, NECKS,
                       ROI_EXTRACTORS, SHARED_HEADS)
from .builder import (build, build_backbone, build_detector, build_head,
                      build_loss, build_neck)
from . import backbones, detectors, heads, losses, necks, shared_heads
