"""MSE loss (parity: mmdet/models/losses/mse_loss.py)."""

from __future__ import annotations

import jax.numpy as jnp

from ..registry import LOSSES
from .utils import weighted_loss


@weighted_loss
def mse_loss(pred, target):
    return (pred - target) ** 2


@LOSSES.register
class MSELoss:
    def __init__(self, reduction="mean", loss_weight=1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * mse_loss(
            pred, target, weight, reduction=reduction, avg_factor=avg_factor)
