"""RetinaNet head (parity: mmdet/models/anchor_heads/retina_head.py:
4-conv cls/reg towers, final 1x1, focal-loss prior bias)."""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from ..registry import HEADS


@HEADS.register
class RetinaHead(nn.Module):
    num_classes: int = 16          # includes background
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    num_anchors: int = 9
    prior_prob: float = 0.01
    dtype: jnp.dtype = jnp.float32

    @property
    def cls_out_channels(self):
        return self.num_classes - 1  # sigmoid head

    @nn.compact
    def __call__(self, feats):
        cls_tower = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             dtype=self.dtype, name=f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        reg_tower = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             dtype=self.dtype, name=f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        bias_init = nn.initializers.constant(
            -math.log((1 - self.prior_prob) / self.prior_prob))
        cls_head = nn.Conv(self.num_anchors * self.cls_out_channels, (3, 3),
                           padding=1, bias_init=bias_init, dtype=self.dtype,
                           name="retina_cls")
        reg_head = nn.Conv(self.num_anchors * 4, (3, 3), padding=1,
                           dtype=self.dtype, name="retina_reg")

        cls_out, reg_out = [], []
        for f in feats:
            c = r = f
            for conv_c, conv_r in zip(cls_tower, reg_tower):
                c = nn.relu(conv_c(c))
                r = nn.relu(conv_r(r))
            cls_out.append(cls_head(c))
            reg_out.append(reg_head(r))
        return cls_out, reg_out
