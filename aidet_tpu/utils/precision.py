"""Mixed-precision helpers.

Parity target: mmdet/core/fp16 (auto_fp16/force_fp32 decorators +
Fp16OptimizerHook).  On TPU the story simplifies: bf16 needs no loss
scaling, so "fp16 mode" maps to bf16 params/compute with fp32 loss
and norm statistics.  The detectors already accept ``dtype``
(compute dtype) per module; these helpers handle parameter casting
and an optional static loss-scale for true-fp16 experiments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_fp16_cfg(cfg, model_cfg: dict) -> dict:
    """Map a config-level ``fp16 = dict(...)`` flag (reference
    configs/fp16, core/fp16/hooks.py) onto the detector's compute
    dtype: bf16 on TPU, no loss scaling needed. The single source for
    both the train (tools/train.py) and inference (apis/inference.py)
    sides — they must agree or a checkpoint trained under one mapping
    is evaluated under another."""
    if cfg.get("fp16"):
        model_cfg.setdefault("dtype", jnp.bfloat16)
    return model_cfg


def wrap_bf16_model(variables):
    """Cast a variables tree's params to bf16 (weights only; batch
    statistics stay fp32 — the patch_norm_fp32 analog)."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(jnp.bfloat16)
        return x
    out = dict(variables)
    out["params"] = jax.tree.map(cast, variables["params"])
    return out


def cast_tensor_type(tree, src_type, dst_type):
    """Parity: mmdet/core/fp16/utils.py cast_tensor_type."""
    def cast(x):
        if hasattr(x, "dtype") and x.dtype == src_type:
            return x.astype(dst_type)
        return x
    return jax.tree.map(cast, tree)


class StaticLossScale:
    """Parity: Fp16OptimizerHook's static scale-512 loss scaling
    (core/fp16/hooks.py:11-85).  Unnecessary for bf16; provided for
    fp16 experiments: scale the loss, unscale the grads."""

    def __init__(self, scale: float = 512.0):
        self.scale = scale

    def scale_loss(self, loss):
        return loss * self.scale

    def unscale_grads(self, grads):
        inv = 1.0 / self.scale
        return jax.tree.map(lambda g: g * inv, grads)
