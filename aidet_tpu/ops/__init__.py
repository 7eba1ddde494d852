from .nms import (nms, soft_nms, rnms, multiclass_nms,
                  multiclass_nms_with_index, batched_nms)
from .roi_align import (roi_align, multilevel_roi_align,
                        multilevel_roi_align_fused)
from .focal_loss import sigmoid_focal_loss
from .deform_conv import deform_conv2d, DeformConv2d
from .carafe import carafe, CARAFEPack
from .grid_sample import affine_grid, grid_sample, masked_conv2d
from .rroi_align import (rroi_align_fused, batched_rroi_align,
                         map_rroi_levels)
