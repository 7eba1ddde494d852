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
    style: str = "pytorch"        # 'caffe' for the r50_caffe_c4 family
    norm_cfg: dict | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: [N, s, s, C] roi feats → [N, s/stride, s/stride, C']."""
        block_cls, stage_blocks = ARCH_SETTINGS[self.depth]
        planes = 64 * 2 ** self.stage
        kw = dict(norm_cfg=self.norm_cfg, dtype=self.dtype)
        if block_cls is Bottleneck:   # BasicBlock has no style switch
            kw["style"] = self.style
        for b in range(stage_blocks[self.stage]):
            x = block_cls(planes=planes,
                          stride=self.stride if b == 0 else 1,
                          downsample=(b == 0),
                          name=f"layer{self.stage + 1}_block{b}", **kw)(x)
        return x
