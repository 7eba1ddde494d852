"""Balanced Feature Pyramid (parity: mmdet/models/necks/bfp.py: gather
all levels to one resolution, average, refine, scatter back as
residuals; Libra R-CNN)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import NECKS


@NECKS.register
class BFP(nn.Module):
    in_channels: int = 256
    num_levels: int = 5
    refine_level: int = 2
    refine_type: str = "conv"     # 'conv' | 'none' (non_local → later)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        assert len(inputs) == self.num_levels
        ref = inputs[self.refine_level]
        h, w = ref.shape[-3], ref.shape[-2]

        def to_ref(x):
            return jax.image.resize(
                x, x.shape[:-3] + (h, w, x.shape[-1]), method="nearest")

        gathered = sum(to_ref(x) for x in inputs) / self.num_levels
        if self.refine_type == "conv":
            gathered = nn.Conv(self.in_channels, (3, 3), padding=1,
                               dtype=self.dtype, name="refine")(gathered)
        outs = []
        for x in inputs:
            hh, ww = x.shape[-3], x.shape[-2]
            res = jax.image.resize(
                gathered, gathered.shape[:-3] + (hh, ww,
                                                 gathered.shape[-1]),
                method="nearest")
            outs.append(x + res)
        return tuple(outs)
