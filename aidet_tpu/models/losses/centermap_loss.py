"""CenterMap regression loss (parity: mmdet/models/losses/centermap_loss.py).

The reference slices each positive RoI's predicted map at its class
channel and regresses the soft centerness pseudo-mask with MSE,
optionally reweighted by a per-pixel mask weight (CenterMapLoss:33-71,
mask_centermap:9-20, mask_weight_centermap:22-31).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..registry import LOSSES
from .utils import weight_reduce_loss


@LOSSES.register
class CenterMapLoss:
    def __init__(self, reduction="mean", loss_weight=1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, label, mask_weight=None,
                 roi_weight=None, avg_factor=None):
        """Args:
          pred: [R, S, S, C] centermap logits (no sigmoid — the
            reference regresses raw values, centermap_head.py:34-47).
          target: [R, S, S] soft centerness targets in [0, 1].
          label: [R] 1-based class per roi.
          mask_weight: optional [R, S, S] per-pixel weights.
          roi_weight: optional [R] per-roi weights (e.g. is_pos mask).
        """
        c = pred.shape[-1]
        idx = jnp.clip(label.astype(jnp.int32) - 1, 0, c - 1)
        pred_c = jnp.take_along_axis(
            pred, idx[:, None, None, None], axis=-1)[..., 0]
        loss = (pred_c - target) ** 2
        if mask_weight is not None:
            loss = loss * mask_weight
        if roi_weight is not None:
            loss = loss * roi_weight[:, None, None]
        return self.loss_weight * weight_reduce_loss(
            loss, None, self.reduction, avg_factor)
