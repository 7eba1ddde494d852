"""SSD-VGG16 backbone (parity: mmdet/models/backbones/ssd_vgg.py:
VGG16 trunk with dilated fc-convs + extra feature layers + L2Norm on
conv4_3)."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..registry import BACKBONES

VGG16_CFG = (2, 2, 3, 3, 3)  # convs per block


class L2Norm(nn.Module):
    scale: float = 20.0

    @nn.compact
    def __call__(self, x):
        g = self.param("gamma",
                       nn.initializers.constant(self.scale),
                       (x.shape[-1],))
        norm = jnp.sqrt((x * x).sum(-1, keepdims=True) + 1e-10)
        return x / norm * g


@BACKBONES.register
class SSDVGG(nn.Module):
    input_size: int = 300
    depth: int = 16
    out_feature_indices: Sequence[int] = (22, 34)
    dtype: jnp.dtype = jnp.float32
    pretrained: str | None = None

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        outs = []
        chans = (64, 128, 256, 512, 512)
        # VGG blocks; conv4_3 output (end of block 4, pre-pool) is tap 1
        for b, (n, c) in enumerate(zip(VGG16_CFG, chans)):
            for k in range(n):
                x = nn.relu(nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                                    name=f"conv{b + 1}_{k + 1}")(x))
            if b == 3:
                outs.append(L2Norm(name="l2norm")(x))
            if b < 4:
                # ceil-mode pooling (torch ceil_mode=True) keeps the
                # canonical SSD300 ladder 300→150→75→38→19
                x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")
            else:  # pool5: 3x3 stride 1 (ssd_vgg.py)
                x = nn.max_pool(x, (3, 3), strides=(1, 1),
                                padding=[(1, 1), (1, 1)])
        # fc6/fc7 as dilated convs
        x = nn.relu(nn.Conv(1024, (3, 3), padding=6, kernel_dilation=(6, 6),
                            dtype=self.dtype, name="fc6")(x))
        x = nn.relu(nn.Conv(1024, (1, 1), dtype=self.dtype, name="fc7")(x))
        outs.append(x)
        # extra layers: alternating 1x1 / stride-2 3x3
        extra_cfg = ((256, 512, 2), (128, 256, 2), (128, 256, 1),
                     (128, 256, 1))
        for i, (c1, c2, s) in enumerate(extra_cfg):
            x = nn.relu(nn.Conv(c1, (1, 1), dtype=self.dtype,
                                name=f"extra{i}_1")(x))
            pad = 1 if s == 2 else 0
            x = nn.relu(nn.Conv(c2, (3, 3), strides=(s, s),
                                padding=[(pad, pad), (pad, pad)],
                                dtype=self.dtype, name=f"extra{i}_2")(x))
            outs.append(x)
        return tuple(outs)
