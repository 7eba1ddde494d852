"""Feature Pyramid Network (parity: mmdet/models/necks/fpn.py:11-178).

Lateral 1x1 convs + nearest top-down merge + 3x3 output convs; extra
levels either by stride-2 max-pool (Faster R-CNN) or stride-2 convs on
the input/last output (RetinaNet's add_extra_convs).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import NECKS


@NECKS.register
class Identity(nn.Module):
    """No-op neck: pass the backbone tuple through unchanged.

    The C4-style detectors (faster_rcnn_r50_caffe_c4_1x.py) have no
    neck — the RPN and RoI heads work directly on the single C4 stage;
    the reference expresses this by omitting `neck` from the config,
    which in this framework would fall back to the default FPN.
    """
    dtype: jnp.dtype = jnp.float32   # accepted for config uniformity

    @nn.compact
    def __call__(self, feats):
        return feats


def _upsample_nearest_2x(x, like):
    """Nearest-neighbour upsample x to `like`'s spatial dims."""
    h, w = like.shape[-3], like.shape[-2]
    return jax.image.resize(x, x.shape[:-3] + (h, w, x.shape[-1]),
                            method="nearest")


class _ConvBP(nn.Module):
    """Param twin of nn.Conv (kernel + bias, default inits) — declares
    the identical checkpoint tree without running the conv, for paths
    that contract with a manually combined kernel (e.g. the RPN head's
    single cls+reg 1x1)."""
    shape: tuple          # (kh, kw, cin, cout)

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       self.shape)
        b = self.param("bias", nn.initializers.zeros, (self.shape[-1],))
        return k, b


@NECKS.register
class FPN(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    end_level: int = -1
    add_extra_convs: bool = False
    extra_convs_on_inputs: bool = True
    relu_before_extra_convs: bool = False
    dtype: jnp.dtype = jnp.float32
    # norm_cfg=dict(type='GN', num_groups=32): GroupNorm after every
    # lateral/output/extra conv, convs bias-less (reference ConvModule
    # bias = norm_cfg is None; configs/gn)
    norm_cfg: dict | None = None

    def _norm(self, name):
        from ..backbones.resnet import make_norm
        if self.norm_cfg is None:
            return lambda x: x
        return make_norm(self.norm_cfg, self.dtype, name)

    @nn.compact
    def __call__(self, inputs):
        assert len(inputs) == len(self.in_channels)
        end = (len(self.in_channels) if self.end_level == -1
               else self.end_level + 1)
        used = list(inputs[self.start_level:end])

        bias = self.norm_cfg is None
        laterals = [
            self._norm(f"lateral_norm{i}")(
                nn.Conv(self.out_channels, (1, 1), use_bias=bias,
                        dtype=self.dtype, name=f"lateral{i}")(x))
            for i, x in enumerate(used)
        ]
        # top-down pathway
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample_nearest_2x(
                laterals[i], laterals[i - 1])

        outs = [
            self._norm(f"fpn_norm{i}")(
                nn.Conv(self.out_channels, (3, 3), padding=1,
                        use_bias=bias, dtype=self.dtype,
                        name=f"fpn{i}")(laterals[i]))
            for i in range(len(laterals))
        ]

        # extra levels (fpn.py:137-160)
        extra = self.num_outs - len(outs)
        if extra > 0:
            if not self.add_extra_convs:
                for _ in range(extra):
                    outs.append(nn.max_pool(outs[-1], (1, 1),
                                            strides=(2, 2)))
            else:
                src = used[-1] if self.extra_convs_on_inputs else outs[-1]
                out = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                              padding=1, dtype=self.dtype,
                              name="extra0")(src)
                outs.append(out)
                for i in range(1, extra):
                    src = outs[-1]
                    if self.relu_before_extra_convs:
                        src = nn.relu(src)
                    outs.append(nn.Conv(self.out_channels, (3, 3),
                                        strides=(2, 2), padding=1,
                                        dtype=self.dtype,
                                        name=f"extra{i}")(src))
        return tuple(outs)
