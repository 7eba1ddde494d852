"""Loss weighting/reduction helpers.

Parity: mmdet/models/losses/utils.py (weight_reduce_loss / weighted_loss):
'mean' divides by avg_factor when given, else by element count.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp


def reduce_loss(loss, reduction: str):
    if reduction == "none":
        return loss
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    raise ValueError(reduction)


def weight_reduce_loss(loss, weight=None, reduction="mean", avg_factor=None):
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        return reduce_loss(loss, reduction)
    if reduction == "mean":
        return loss.sum() / avg_factor
    if reduction == "none":
        return loss
    raise ValueError("avg_factor only valid with reduction='mean'/'none'")


def weighted_loss(fn):
    """Wrap an elementwise loss fn(pred, target, **kw) with
    weight/reduction/avg_factor handling."""
    @functools.wraps(fn)
    def wrapper(pred, target, weight=None, reduction="mean",
                avg_factor=None, **kwargs):
        loss = fn(pred, target, **kwargs)
        return weight_reduce_loss(loss, weight, reduction, avg_factor)
    return wrapper
