from .utils import reduce_loss, weight_reduce_loss, weighted_loss
from .cross_entropy_loss import (CrossEntropyLoss, binary_cross_entropy,
                                 cross_entropy, mask_cross_entropy)
from .focal_loss import FocalLoss
from .smooth_l1_loss import SmoothL1Loss, smooth_l1_loss
from .balanced_l1_loss import BalancedL1Loss, balanced_l1_loss
from .iou_loss import (BoundedIoULoss, GIoULoss, IoULoss, bounded_iou_loss,
                       giou_loss, iou_loss)
from .mse_loss import MSELoss, mse_loss
from .ghm_loss import GHMC, GHMR
from .centermap_loss import CenterMapLoss
from .accuracy import accuracy
