"""Shared RoI heads (parity: mmdet/models/shared_heads/res_layer.py):
the res5 stage applied to roi features for C4-style models."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .backbones.resnet import ARCH_SETTINGS, Bottleneck
from .registry import SHARED_HEADS


@SHARED_HEADS.register
class ResLayer(nn.Module):
    """The last ResNet stage (res5) as a shared RoI head."""
    depth: int = 50
    stage: int = 3
    stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: [N, s, s, C] roi feats → [N, s/stride, s/stride, C']."""
        block_cls, stage_blocks = ARCH_SETTINGS[self.depth]
        planes = 64 * 2 ** self.stage
        for b in range(stage_blocks[self.stage]):
            x = block_cls(planes=planes,
                          stride=self.stride if b == 0 else 1,
                          downsample=(b == 0), dtype=self.dtype,
                          name=f"layer{self.stage + 1}_block{b}")(x)
        return x
