"""Top-k accuracy metric (parity: mmdet/models/losses/accuracy.py)."""

from __future__ import annotations

import jax.numpy as jnp


def accuracy(pred, target, topk=1, weight=None):
    """pred: [..., C] logits; target: [...] int labels."""
    return_single = isinstance(topk, int)
    topks = (topk,) if return_single else tuple(topk)
    maxk = max(topks)
    idx = jnp.argsort(-pred, axis=-1)[..., :maxk]
    correct = idx == target[..., None]
    if weight is None:
        weight = jnp.ones(target.shape, pred.dtype)
    denom = jnp.maximum(weight.sum(), 1.0)
    res = []
    for k in topks:
        hit = correct[..., :k].any(-1).astype(pred.dtype)
        res.append((hit * weight).sum() / denom * 100.0)
    return res[0] if return_single else res
