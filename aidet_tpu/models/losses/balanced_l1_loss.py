"""Balanced L1 (Libra R-CNN; parity: mmdet/models/losses/balanced_l1_loss.py)."""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..registry import LOSSES
from .utils import weighted_loss


@weighted_loss
def balanced_l1_loss(pred, target, beta=1.0, alpha=0.5, gamma=1.5):
    diff = jnp.abs(pred - target)
    b = math.e ** (gamma / alpha) - 1
    return jnp.where(
        diff < beta,
        alpha / b * (b * diff + 1) * jnp.log(b * diff / beta + 1)
        - alpha * diff,
        gamma * diff + gamma / b - alpha * beta)


@LOSSES.register
class BalancedL1Loss:
    def __init__(self, alpha=0.5, gamma=1.5, beta=1.0, reduction="mean",
                 loss_weight=1.0):
        self.alpha = alpha
        self.gamma = gamma
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * balanced_l1_loss(
            pred, target, weight, beta=self.beta, alpha=self.alpha,
            gamma=self.gamma, reduction=reduction, avg_factor=avg_factor)
