"""IoU-family regression losses (parity: mmdet/models/losses/iou_loss.py)."""

from __future__ import annotations

import jax.numpy as jnp

from ...core.boxes import bbox_overlaps
from ..registry import LOSSES
from .utils import weighted_loss


@weighted_loss
def iou_loss(pred, target, eps=1e-6):
    ious = jnp.clip(bbox_overlaps(pred, target, aligned=True), eps, None)
    return -jnp.log(ious)


@weighted_loss
def bounded_iou_loss(pred, target, beta=0.2, eps=1e-3):
    px = (pred[..., 0] + pred[..., 2]) * 0.5
    py = (pred[..., 1] + pred[..., 3]) * 0.5
    pw = pred[..., 2] - pred[..., 0] + 1.0
    ph = pred[..., 3] - pred[..., 1] + 1.0
    tx = (target[..., 0] + target[..., 2]) * 0.5
    ty = (target[..., 1] + target[..., 3]) * 0.5
    tw = target[..., 2] - target[..., 0] + 1.0
    th = target[..., 3] - target[..., 1] + 1.0

    dx = tx - px
    dy = ty - py
    loss_dx = 1 - jnp.maximum(
        (tw - 2 * jnp.abs(dx)) / (tw + 2 * jnp.abs(dx) + eps), 0)
    loss_dy = 1 - jnp.maximum(
        (th - 2 * jnp.abs(dy)) / (th + 2 * jnp.abs(dy) + eps), 0)
    loss_dw = 1 - jnp.minimum(tw / (pw + eps), pw / (tw + eps))
    loss_dh = 1 - jnp.minimum(th / (ph + eps), ph / (th + eps))
    comb = jnp.stack([loss_dx, loss_dy, loss_dw, loss_dh], axis=-1)
    return jnp.where(comb < beta, 0.5 * comb * comb / beta,
                     comb - 0.5 * beta).sum(-1)


@weighted_loss
def giou_loss(pred, target, eps=1e-7):
    lt = jnp.minimum(pred[..., :2], target[..., :2])
    rb = jnp.maximum(pred[..., 2:], target[..., 2:])
    wh = jnp.clip(rb - lt + 1.0, 0, None)
    enclose = wh[..., 0] * wh[..., 1]
    area_p = ((pred[..., 2] - pred[..., 0] + 1)
              * (pred[..., 3] - pred[..., 1] + 1))
    area_t = ((target[..., 2] - target[..., 0] + 1)
              * (target[..., 3] - target[..., 1] + 1))
    inter_lt = jnp.maximum(pred[..., :2], target[..., :2])
    inter_rb = jnp.minimum(pred[..., 2:], target[..., 2:])
    inter_wh = jnp.clip(inter_rb - inter_lt + 1.0, 0, None)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    union = jnp.maximum(area_p + area_t - inter, eps)
    gious = inter / union - (enclose - union) / jnp.maximum(enclose, eps)
    return 1 - gious


@LOSSES.register
class IoULoss:
    def __init__(self, eps=1e-6, reduction="mean", loss_weight=1.0):
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight
        self._fn = iou_loss

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        if weight is not None and weight.ndim > 1:
            weight = weight.mean(-1)
        return self.loss_weight * self._fn(
            pred, target, weight, eps=self.eps, reduction=reduction,
            avg_factor=avg_factor)


@LOSSES.register
class BoundedIoULoss(IoULoss):
    def __init__(self, beta=0.2, eps=1e-3, reduction="mean",
                 loss_weight=1.0):
        super().__init__(eps=eps, reduction=reduction,
                         loss_weight=loss_weight)
        self.beta = beta
        self._fn = lambda *a, **k: bounded_iou_loss(*a, beta=beta, **k)


@LOSSES.register
class GIoULoss(IoULoss):
    def __init__(self, eps=1e-7, reduction="mean", loss_weight=1.0):
        super().__init__(eps=eps, reduction=reduction,
                         loss_weight=loss_weight)
        self._fn = giou_loss
