"""Gradient-harmonizing losses (parity: mmdet/models/losses/ghm_loss.py).

The reference keeps a momentum-updated density buffer (acc_sum); in
functional JAX there is no module state, so the density statistics are
recomputed per batch regardless of ``momentum`` (the momentum term only
smooths the density estimate across steps — the harmonizing weights
stay within-batch-correct). The gradient-length binning is detached
from the autodiff graph exactly like the reference's ``.detach()``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..registry import LOSSES


def _expand_binary_labels(labels, weight, num_classes):
    """1-based int labels → one-hot over foreground channels
    (ghm_loss.py:8-15: channel c = class c+1; label 0 → all-zero row)."""
    bin_labels = jax.nn.one_hot(labels.astype(jnp.int32) - 1, num_classes)
    if weight is None:
        weight = jnp.ones(labels.shape, bin_labels.dtype)
    bin_weights = jnp.broadcast_to(weight[..., None], bin_labels.shape)
    return bin_labels, bin_weights


def _ghm_weights(g, valid, edges, bins, tot, dtype):
    """Per-element harmonizing weights tot / density(bin(g)), averaged
    over the number of non-empty bins (ghm_loss.py:78-91, 156-168).

    ``g`` must already be detached; weights carry no gradient.
    """
    weights = jnp.zeros(g.shape, dtype)
    n_nonempty = jnp.asarray(0.0, dtype)
    for i in range(bins):
        inds = (g >= edges[i]) & (g < edges[i + 1]) & valid
        num_in_bin = inds.sum().astype(dtype)
        has = num_in_bin > 0
        w = jnp.where(inds, tot / jnp.maximum(num_in_bin, 1.0), 0.0)
        weights = weights + jnp.where(has, w, 0.0)
        n_nonempty = n_nonempty + has.astype(dtype)
    return weights / jnp.maximum(n_nonempty, 1.0)


@LOSSES.register
class GHMC:
    """GHM classification loss (ghm_loss.py:20-95)."""

    def __init__(self, bins=10, momentum=0.0, use_sigmoid=True,
                 loss_weight=1.0):
        assert use_sigmoid
        self.bins = bins
        self.momentum = momentum
        self.loss_weight = loss_weight
        self.edges = jnp.asarray(
            [i / bins for i in range(bins + 1)]).at[-1].add(1e-6)

    def __call__(self, pred, target, weight=None, avg_factor=None):
        if target.ndim != pred.ndim:
            target, weight = _expand_binary_labels(
                target, weight, pred.shape[-1])
        target = target.astype(pred.dtype)
        if weight is None:
            weight = jnp.ones_like(pred)
        weight = jnp.broadcast_to(weight, pred.shape)
        valid = weight > 0
        tot = jnp.maximum(valid.sum().astype(pred.dtype), 1.0)

        # gradient length, detached (ghm_loss.py:73)
        g = jax.lax.stop_gradient(jnp.abs(jax.nn.sigmoid(pred) - target))
        weights = _ghm_weights(g, valid, self.edges, self.bins, tot,
                               pred.dtype)

        ce = jnp.maximum(pred, 0) - pred * target + jnp.log1p(
            jnp.exp(-jnp.abs(pred)))
        loss = (ce * weights).sum() / tot
        return loss * self.loss_weight


@LOSSES.register
class GHMR:
    """GHM regression loss — authentic smooth-L1 (ghm_loss.py:98-177)."""

    def __init__(self, mu=0.02, bins=10, momentum=0.0, loss_weight=1.0):
        self.mu = mu
        self.bins = bins
        self.momentum = momentum
        self.loss_weight = loss_weight
        self.edges = jnp.asarray(
            [i / bins for i in range(bins + 1)]).at[-1].set(1e3)

    def __call__(self, pred, target, weight=None, avg_factor=None):
        mu = self.mu
        diff = pred - target
        loss = jnp.sqrt(diff * diff + mu * mu) - mu
        if weight is None:
            weight = jnp.ones_like(pred)
        weight = jnp.broadcast_to(weight, pred.shape).astype(pred.dtype)
        valid = weight > 0
        # normalizer is the weight SUM here (vs the valid COUNT in
        # GHMC) — ghm_loss.py:153
        tot = jnp.maximum(weight.sum(), 1.0)

        g = jax.lax.stop_gradient(
            jnp.abs(diff / jnp.sqrt(mu * mu + diff * diff)))
        weights = _ghm_weights(g, valid, self.edges, self.bins, tot,
                               pred.dtype)

        return (loss * weights).sum() / tot * self.loss_weight
