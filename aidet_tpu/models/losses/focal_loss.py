"""Focal loss wrapper (parity: mmdet/models/losses/focal_loss.py)."""

from __future__ import annotations

from ...ops.focal_loss import sigmoid_focal_loss
from ..registry import LOSSES
from .utils import weight_reduce_loss


@LOSSES.register
class FocalLoss:
    def __init__(self, use_sigmoid=True, gamma=2.0, alpha=0.25,
                 reduction="mean", loss_weight=1.0):
        assert use_sigmoid, "only sigmoid focal loss is supported"
        self.gamma = gamma
        self.alpha = alpha
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        loss = sigmoid_focal_loss(pred, target, self.gamma, self.alpha)
        if weight is not None and weight.ndim != loss.ndim:
            weight = weight[..., None]
        return self.loss_weight * weight_reduce_loss(
            loss, weight, reduction, avg_factor)
