"""HRFPN neck (parity: mmdet/models/necks/hrfpn.py:12-100: concat all
HRNet streams at the highest resolution, 1x1 reduce, then avg-pool out
a pyramid with 3x3 convs)."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import NECKS


@NECKS.register
class HRFPN(nn.Module):
    in_channels: Sequence[int] = (32, 64, 128, 256)
    out_channels: int = 256
    num_outs: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        assert len(inputs) == len(self.in_channels)
        h, w = inputs[0].shape[-3], inputs[0].shape[-2]
        ups = [inputs[0]]
        for x in inputs[1:]:
            ups.append(jax.image.resize(
                x, x.shape[:-3] + (h, w, x.shape[-1]), method="bilinear"))
        x = jnp.concatenate(ups, axis=-1)
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name="reduce")(x)
        outs = []
        for i in range(self.num_outs):
            y = x
            if i > 0:
                k = 2 ** i
                y = nn.avg_pool(x, (k, k), strides=(k, k))
            outs.append(nn.Conv(self.out_channels, (3, 3), padding=1,
                                dtype=self.dtype, name=f"fpn{i}")(y))
        return tuple(outs)
