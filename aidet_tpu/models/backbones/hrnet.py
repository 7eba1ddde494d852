"""HRNet backbone (parity: mmdet/models/backbones/hrnet.py:12-195:
parallel multi-resolution branches with repeated cross-resolution
fusion; returns the 4 resolution streams)."""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import BACKBONES
from .resnet import BasicBlock, Bottleneck, FrozenBN, conv


def _resize_to(x, like):
    h, w = like.shape[-3], like.shape[-2]
    return jax.image.resize(x, x.shape[:-3] + (h, w, x.shape[-1]),
                            method="nearest")


class HRModule(nn.Module):
    """One multi-branch stage: per-branch residual blocks + full
    cross-resolution fusion (HRModule, hrnet.py:12-105)."""
    num_branches: int
    num_blocks: int
    channels: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs):
        assert len(xs) == self.num_branches
        outs = []
        for b in range(self.num_branches):
            x = xs[b]
            for k in range(self.num_blocks):
                x = BasicBlock(planes=self.channels[b],
                               downsample=(k == 0 and
                                           x.shape[-1] != self.channels[b]),
                               dtype=self.dtype,
                               name=f"branch{b}_block{k}")(x)
            outs.append(x)
        # fusion: every output gets contributions from every branch
        fused = []
        for i in range(self.num_branches):
            acc = outs[i]
            for j in range(self.num_branches):
                if i == j:
                    continue
                y = outs[j]
                if j > i:      # lower res → upsample + 1x1
                    y = conv(self.channels[i], 1, 1, 1,
                             f"fuse{i}_{j}", self.dtype)(y)
                    y = FrozenBN(dtype=self.dtype,
                                 name=f"fuse_bn{i}_{j}")(y)
                    y = _resize_to(y, acc)
                else:          # higher res → strided 3x3 chain
                    for s in range(i - j):
                        last = s == i - j - 1
                        ch = self.channels[i] if last else y.shape[-1]
                        y = conv(ch, 3, 2, 1,
                                 f"fuse{i}_{j}_{s}", self.dtype)(y)
                        y = FrozenBN(dtype=self.dtype,
                                     name=f"fuse_bn{i}_{j}_{s}")(y)
                        if not last:
                            y = nn.relu(y)
                acc = acc + y
            fused.append(nn.relu(acc))
        return fused


@BACKBONES.register
class HRNet(nn.Module):
    """HRNet-W{18,32,40,...}: ``width`` sets the base channel count."""
    width: int = 32
    stage_modules: Sequence[int] = (1, 1, 4, 3)   # modules per stage
    stage_blocks: int = 4
    dtype: jnp.dtype = jnp.float32
    norm_eval: bool = True
    pretrained: str | None = None

    @nn.compact
    def __call__(self, x):
        w = self.width
        chans = (w, w * 2, w * 4, w * 8)
        x = x.astype(self.dtype)
        # stem: two stride-2 3x3 convs (hrnet.py stage1 stem)
        x = conv(64, 3, 2, 1, "stem1", self.dtype)(x)
        x = FrozenBN(dtype=self.dtype, name="stem_bn1")(x)
        x = nn.relu(x)
        x = conv(64, 3, 2, 1, "stem2", self.dtype)(x)
        x = FrozenBN(dtype=self.dtype, name="stem_bn2")(x)
        x = nn.relu(x)
        # stage 1: 4 bottlenecks at 1/4 res, num_channels=64 → 256-dim
        # output (reference HRNet stage1; pretrained checkpoints map
        # onto this tree only at the reference width)
        for k in range(4):
            x = Bottleneck(planes=64, downsample=(k == 0),
                           dtype=self.dtype, name=f"layer1_block{k}")(x)

        # transitions + stages 2..4
        xs = [x]
        for stage in range(1, 4):
            n_br = stage + 1
            new_xs = []
            for b in range(n_br):
                if b < len(xs):
                    y = xs[b]
                    if y.shape[-1] != chans[b]:
                        y = conv(chans[b], 3, 1, 1,
                                 f"t{stage}_{b}", self.dtype)(y)
                        y = FrozenBN(dtype=self.dtype,
                                     name=f"t_bn{stage}_{b}")(y)
                        y = nn.relu(y)
                else:          # new lower-res branch from the last
                    y = conv(chans[b], 3, 2, 1,
                             f"t{stage}_{b}", self.dtype)(xs[-1])
                    y = FrozenBN(dtype=self.dtype,
                                 name=f"t_bn{stage}_{b}")(y)
                    y = nn.relu(y)
                new_xs.append(y)
            xs = new_xs
            for m in range(self.stage_modules[stage]):
                xs = HRModule(num_branches=n_br,
                              num_blocks=self.stage_blocks,
                              channels=chans[:n_br], dtype=self.dtype,
                              name=f"stage{stage + 1}_module{m}")(xs)
        return tuple(xs)
