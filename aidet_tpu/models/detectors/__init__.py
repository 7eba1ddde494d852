from .two_stage import (TwoStageDetector, FasterRCNN, FastRCNN, MaskRCNN,
                        MaskScoringRCNN, RBBoxRCNN, MaskOBB, CenterMapOBB,
                        CenterMapNet, DoubleHeadRCNN, GridRCNN,
                        GAFasterRCNN)
from .single_stage import (SingleStageDetector, RetinaNet,
                           FreeAnchorRetinaNet)
from .rpn import RPN
from .cascade import CascadeRCNN, HTC
