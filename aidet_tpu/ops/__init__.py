from .nms import (nms, soft_nms, rnms, multiclass_nms,
                  multiclass_nms_with_index, batched_nms)
from .roi_align import roi_align, multilevel_roi_align
from .focal_loss import sigmoid_focal_loss
