from .two_stage import (TwoStageDetector, FasterRCNN, MaskRCNN, RBBoxRCNN,
                        MaskOBB, CenterMapOBB, CenterMapNet)
from .single_stage import SingleStageDetector, RetinaNet
from .rpn import RPN
from .cascade import CascadeRCNN, HTC
