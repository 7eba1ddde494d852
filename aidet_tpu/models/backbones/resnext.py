"""ResNeXt backbone (parity: mmdet/models/backbones/resnext.py:
grouped 3x3 bottleneck, groups/base_width)."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import BACKBONES
from .resnet import ARCH_SETTINGS, FrozenBN, conv


class XBottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    groups: int = 32
    base_width: int = 4
    dtype: jnp.dtype = jnp.float32
    expansion: int = 4
    style: str = "pytorch"

    @nn.compact
    def __call__(self, x):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        # caffe style strides conv1, pytorch style strides the 3x3
        s1, s2 = ((self.stride, 1) if self.style == "caffe"
                  else (1, self.stride))
        identity = x
        out = conv(width, 1, s1, 1, "conv1", self.dtype)(x)
        out = FrozenBN(dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        pad = self.dilation
        out = nn.Conv(width, (3, 3), strides=(s2, s2),
                      padding=[(pad, pad), (pad, pad)],
                      kernel_dilation=(self.dilation, self.dilation),
                      feature_group_count=self.groups, use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = FrozenBN(dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = conv(self.planes * 4, 1, 1, 1, "conv3", self.dtype)(out)
        out = FrozenBN(dtype=self.dtype, name="bn3")(out)
        if self.downsample:
            identity = conv(self.planes * 4, 1, self.stride, 1,
                            "ds_conv", self.dtype)(x)
            identity = FrozenBN(dtype=self.dtype, name="ds_bn")(identity)
        return nn.relu(out + identity)


@BACKBONES.register
class ResNeXt(nn.Module):
    depth: int = 101
    groups: int = 32
    base_width: int = 4
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    base_channels: int = 64
    dtype: jnp.dtype = jnp.float32
    frozen_stages: int = 1
    norm_eval: bool = True
    style: str = "pytorch"
    pretrained: str | None = None

    @nn.compact
    def __call__(self, x):
        _, stage_blocks = ARCH_SETTINGS[self.depth]
        x = x.astype(self.dtype)
        x = conv(self.base_channels, 7, 2, 1, "stem_conv", self.dtype)(x)
        x = FrozenBN(dtype=self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        if self.frozen_stages >= 0:
            # in-graph requires_grad=False on the stem (resnet.py:296)
            x = jax.lax.stop_gradient(x)
        outs = []
        for i in range(self.num_stages):
            planes = self.base_channels * 2 ** i
            for b in range(stage_blocks[i]):
                x = XBottleneck(
                    planes=planes,
                    stride=self.strides[i] if b == 0 else 1,
                    dilation=self.dilations[i], downsample=(b == 0),
                    groups=self.groups, base_width=self.base_width,
                    style=self.style,
                    dtype=self.dtype, name=f"layer{i + 1}_block{b}")(x)
            if i + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)
