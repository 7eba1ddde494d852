"""Cross-entropy losses (parity: mmdet/models/losses/cross_entropy_loss.py).

Labels follow the reference convention: 0 = background, 1..C = classes,
and logits carry C+1 channels (softmax) or C channels (sigmoid).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..registry import LOSSES
from .utils import weight_reduce_loss


def cross_entropy(pred, label, weight=None, reduction="mean",
                  avg_factor=None):
    """Softmax CE over the last dim; label is int (incl. background 0)."""
    logp = jax.nn.log_softmax(pred, axis=-1)
    ll = jnp.take_along_axis(logp, label[..., None].astype(jnp.int32),
                             axis=-1)[..., 0]
    return weight_reduce_loss(-ll, weight, reduction, avg_factor)


def binary_cross_entropy(pred, label, weight=None, reduction="mean",
                         avg_factor=None):
    """Sigmoid BCE; label may be int class ids (expanded one-hot with
    the reference's channel c = class c+1 convention) or same-shape."""
    if label.ndim != pred.ndim:
        c = pred.shape[-1]
        onehot = jax.nn.one_hot(label.astype(jnp.int32) - 1, c,
                                dtype=pred.dtype)
        if weight is not None and weight.ndim != pred.ndim:
            weight = weight[..., None]
        label = onehot
    label = label.astype(pred.dtype)
    loss = jnp.maximum(pred, 0) - pred * label + jnp.log1p(
        jnp.exp(-jnp.abs(pred)))
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def mask_cross_entropy(pred, target, label=None, reduction="mean",
                       avg_factor=None, weight=None):
    """Per-roi class-sliced sigmoid BCE for mask heads.

    Args:
      pred: [R, S, S, C] mask logits; target: [R, S, S];
      label: [R] 1-based class of each roi (picks the channel).
    """
    if label is not None:
        c = pred.shape[-1]
        idx = jnp.clip(label.astype(jnp.int32) - 1, 0, c - 1)
        pred = jnp.take_along_axis(
            pred, idx[:, None, None, None], axis=-1)[..., 0]
    loss = jnp.maximum(pred, 0) - pred * target + jnp.log1p(
        jnp.exp(-jnp.abs(pred)))
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


@LOSSES.register
class CrossEntropyLoss:
    def __init__(self, use_sigmoid=False, use_mask=False, reduction="mean",
                 loss_weight=1.0):
        assert not (use_sigmoid and use_mask)
        self.use_sigmoid = use_sigmoid
        self.use_mask = use_mask
        self.reduction = reduction
        self.loss_weight = loss_weight
        if use_sigmoid:
            self.criterion = binary_cross_entropy
        elif use_mask:
            self.criterion = mask_cross_entropy
        else:
            self.criterion = cross_entropy

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, **kwargs):
        reduction = reduction_override or self.reduction
        return self.loss_weight * self.criterion(
            pred, target, weight=weight, reduction=reduction,
            avg_factor=avg_factor, **kwargs)
