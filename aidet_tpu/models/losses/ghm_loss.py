"""Gradient-harmonizing losses (parity: mmdet/models/losses/ghm_loss.py).

The reference keeps a momentum-updated density buffer; here the density
statistics are recomputed per batch when momentum == 0 (the published
GHM configs use momentum > 0 only as an option) and carried explicitly
by the caller otherwise — buffers-as-state don't exist in functional JAX.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..registry import LOSSES


def _expand_binary_labels(labels, label_weights, num_classes):
    """1-based int labels → one-hot (channel c = class c+1)."""
    bin_labels = jax.nn.one_hot(labels.astype(jnp.int32) - 1, num_classes)
    bin_weights = jnp.broadcast_to(label_weights[..., None],
                                   bin_labels.shape)
    return bin_labels, bin_weights


@LOSSES.register
class GHMC:
    """GHM classification loss."""

    def __init__(self, bins=10, momentum=0.0, use_sigmoid=True,
                 loss_weight=1.0):
        assert use_sigmoid
        self.bins = bins
        self.momentum = momentum
        self.loss_weight = loss_weight
        self.edges = jnp.asarray(
            [i / bins for i in range(bins + 1)]).at[-1].add(1e-6)

    def __call__(self, pred, target, label_weight, avg_factor=None):
        if pred.ndim != target.ndim:
            target, label_weight = _expand_binary_labels(
                target, label_weight, pred.shape[-1])
        target = target.astype(pred.dtype)
        valid = label_weight > 0
        tot = jnp.maximum(valid.sum(), 1.0)

        g = jnp.abs(jax.nn.sigmoid(pred) - target)
        weights = jnp.zeros_like(pred)
        n_nonempty = 0.0
        for i in range(self.bins):
            inds = (g >= self.edges[i]) & (g < self.edges[i + 1]) & valid
            num_in_bin = inds.sum().astype(pred.dtype)
            has = num_in_bin > 0
            w = jnp.where(inds, tot / jnp.maximum(num_in_bin, 1.0), 0.0)
            weights = weights + jnp.where(has, w, 0.0)
            n_nonempty = n_nonempty + has.astype(pred.dtype)
        weights = weights / jnp.maximum(n_nonempty, 1.0)

        ce = jnp.maximum(pred, 0) - pred * target + jnp.log1p(
            jnp.exp(-jnp.abs(pred)))
        loss = (ce * weights).sum() / tot
        return loss * self.loss_weight


@LOSSES.register
class GHMR:
    """GHM regression loss (authentic smooth-L1 ASL1 form)."""

    def __init__(self, mu=0.02, bins=10, momentum=0.0, loss_weight=1.0):
        self.mu = mu
        self.bins = bins
        self.momentum = momentum
        self.loss_weight = loss_weight
        self.edges = jnp.asarray(
            [i / bins for i in range(bins + 1)]).at[-1].set(1e3)

    def __call__(self, pred, target, label_weight, avg_factor=None):
        mu = self.mu
        diff = pred - target
        loss = jnp.sqrt(diff * diff + mu * mu) - mu
        g = jnp.abs(diff / jnp.sqrt(mu * mu + diff * diff))
        valid = label_weight > 0
        tot = jnp.maximum(valid.sum(), 1.0)

        weights = jnp.zeros_like(g)
        n_nonempty = 0.0
        for i in range(self.bins):
            inds = (g >= self.edges[i]) & (g < self.edges[i + 1]) & valid
            num_in_bin = inds.sum().astype(pred.dtype)
            has = num_in_bin > 0
            w = jnp.where(inds, tot / jnp.maximum(num_in_bin, 1.0), 0.0)
            weights = weights + jnp.where(has, w, 0.0)
            n_nonempty = n_nonempty + has.astype(pred.dtype)
        weights = weights / jnp.maximum(n_nonempty, 1.0)

        return (loss * weights).sum() / tot * self.loss_weight
