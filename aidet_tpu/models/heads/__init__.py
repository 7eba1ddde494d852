from .rpn_head import RPNHead
from .anchor_head import (AnchorHead, flatten_level_outputs,
                          anchor_head_loss, rpn_proposals,
                          anchor_head_bboxes)
from .bbox_head import (BBoxHead, SharedFCBBoxHead, RBBoxHead,
                        DoubleConvFCBBoxHead, MaskIoUHead)
from .mask_head import FCNMaskHead, CenterMapHead, HTCMaskHead
from .retina_head import RetinaHead, RetinaSepBNHead
from .fcos_head import FCOSHead, FCOS
from .atss_head import ATSSHead, ATSS
from .ssd_head import SSDHead, SSD, build_ssd_anchors
from .semantic_head import FusedSemanticHead, WPSGAHead, semantic_loss
from .fovea_head import FoveaHead, FOVEA
from .reppoints_head import RepPointsHead, RepPointsDetector
from .guided_anchor_head import GARetinaHead, GARetinaNet, ga_targets
from .grid_head import GridHead, grid_target, grid_to_boxes
from .free_anchor import free_anchor_loss
