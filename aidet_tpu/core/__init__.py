from . import anchors, assign, boxes, rboxes, riou, sample, targets
from .assign import AssignResult, max_iou_assign
from .sample import (FixedSample, SampleMasks, pseudo_sample_masks,
                     random_sample_masks, sample_fixed)
