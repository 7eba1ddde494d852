"""NAS-FPN neck (parity: mmdet/models/necks/nas_fpn.py): the fixed
NAS-discovered merging-cell topology (GP/sum cells over P3..P7),
repeated ``stack_times``."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import NECKS


def _resize_to(x, like):
    h, w = like.shape[-3], like.shape[-2]
    if x.shape[-3] == h and x.shape[-2] == w:
        return x
    return jax.image.resize(x, x.shape[:-3] + (h, w, x.shape[-1]),
                            method="nearest")


class MergingCell(nn.Module):
    out_channels: int = 256
    binary_op: str = "sum"   # 'sum' | 'gp' (global-pool attention)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, a, b, out_like):
        a = _resize_to(a, out_like)
        b = _resize_to(b, out_like)
        if self.binary_op == "gp":
            att = jax.nn.sigmoid(a.mean(axis=(-3, -2), keepdims=True))
            x = a + b * att
        else:
            x = a + b
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1,
                    dtype=self.dtype, name="conv")(x)
        return x


@NECKS.register
class NASFPN(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    stack_times: int = 7
    start_level: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        feats = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral{i}")(x)
            for i, x in enumerate(inputs[self.start_level:])
        ]
        # extra coarser levels by stride-2 pooling
        while len(feats) < self.num_outs:
            feats.append(nn.max_pool(feats[-1], (1, 1), strides=(2, 2)))
        p3, p4, p5, p6, p7 = feats[:5]

        for t in range(self.stack_times):
            # the published NAS-FPN cell wiring
            p4_1 = MergingCell(self.out_channels, "gp", self.dtype,
                               name=f"s{t}_gp64_4")(p6, p4, p4)
            p4_2 = MergingCell(self.out_channels, "sum", self.dtype,
                               name=f"s{t}_sum44")(p4_1, p4, p4)
            p3 = MergingCell(self.out_channels, "sum", self.dtype,
                             name=f"s{t}_sum43")(p4_2, p3, p3)
            p4 = MergingCell(self.out_channels, "sum", self.dtype,
                             name=f"s{t}_sum34")(p3, p4_2, p4)
            p5_tmp = MergingCell(self.out_channels, "gp", self.dtype,
                                 name=f"s{t}_gp43")(p4_2, p3, p5)
            p5 = MergingCell(self.out_channels, "sum", self.dtype,
                             name=f"s{t}_sum55")(p5_tmp, p5, p5)
            p7_tmp = MergingCell(self.out_channels, "gp", self.dtype,
                                 name=f"s{t}_gp54")(p5, p4_2, p7)
            p7 = MergingCell(self.out_channels, "sum", self.dtype,
                             name=f"s{t}_sum77")(p7_tmp, p7, p7)
            p6 = MergingCell(self.out_channels, "gp", self.dtype,
                             name=f"s{t}_gp75")(p7, p5, p6)
        return (p3, p4, p5, p6, p7)[:self.num_outs]


@NECKS.register
class FPN_CARAFE(nn.Module):
    """FPN with CARAFE upsampling in the top-down path
    (parity: mmdet/models/necks/fpn_carafe.py)."""
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        from ...ops.carafe import CARAFEPack
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral{i}")(x)
            for i, x in enumerate(inputs)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            up = CARAFEPack(channels=self.out_channels,
                            dtype=self.dtype,
                            name=f"carafe{i}")(laterals[i])
            laterals[i - 1] = laterals[i - 1] + _resize_to(
                up, laterals[i - 1])
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1,
                    dtype=self.dtype, name=f"fpn{i}")(laterals[i])
            for i in range(len(laterals))
        ]
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return tuple(outs)
