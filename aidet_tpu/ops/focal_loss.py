"""Sigmoid focal loss — pure JAX; XLA fuses the whole expression, so no
hand-written kernel is needed (the reference's CUDA pair
mmdet/ops/sigmoid_focal_loss/src/*.cu exists only because torch eager
couldn't fuse it)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(logits: jax.Array, targets: jax.Array,
                       gamma: float = 2.0, alpha: float = 0.25) -> jax.Array:
    """Per-element sigmoid focal loss.

    Parity: mmdet/ops/sigmoid_focal_loss (forward math of
    SigmoidFocalLossFunction; consumed by models/losses/focal_loss.py).

    Args:
      logits: [..., C] raw class logits.
      targets: [...] int labels where 1..C are foreground classes and
        0 is background (the reference's CUDA kernel convention: class
        c at channel c-1), OR a [..., C] one-hot/soft target tensor.
    Returns per-element loss [..., C].
    """
    p = jax.nn.sigmoid(logits)
    if targets.ndim == logits.ndim:
        t = targets.astype(logits.dtype)
    else:
        c = logits.shape[-1]
        t = jax.nn.one_hot(targets - 1, c, dtype=logits.dtype)
    # numerically-stable BCE on logits
    ce = jnp.maximum(logits, 0) - logits * t + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    p_t = p * t + (1 - p) * (1 - t)
    alpha_t = alpha * t + (1 - alpha) * (1 - t)
    return alpha_t * (1 - p_t) ** gamma * ce
