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
    # regression dims per anchor: 4 (HBB deltas) or a rotated codec's
    # dim (5 thetaobb / 8 pointobb — rotated RetinaNet)
    reg_dim: int = 4
    dtype: jnp.dtype = jnp.float32

    @property
    def cls_out_channels(self):
        return self.num_classes - 1  # sigmoid head

    @nn.compact
    def __call__(self, feats):
        # all convs init at normal(0.01) (retina_head.py init_weights)
        w_init = nn.initializers.normal(0.01)
        cls_tower = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             kernel_init=w_init,
                             dtype=self.dtype, name=f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        reg_tower = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             kernel_init=w_init,
                             dtype=self.dtype, name=f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        bias_init = nn.initializers.constant(
            -math.log((1 - self.prior_prob) / self.prior_prob))
        cls_head = nn.Conv(self.num_anchors * self.cls_out_channels, (3, 3),
                           padding=1, kernel_init=w_init,
                           bias_init=bias_init, dtype=self.dtype,
                           name="retina_cls")
        reg_head = nn.Conv(self.num_anchors * self.reg_dim, (3, 3),
                           padding=1, kernel_init=w_init,
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


@HEADS.register
class RetinaSepBNHead(nn.Module):
    """RetinaHead variant whose conv weights are SHARED across FPN
    levels while the normalisation parameters are separate per level.

    Parity: RetinaSepBNHead (mmdet/models/anchor_heads/
    retina_sepbn_head.py:1-106): `cls_convs[i][j].conv` shares weights
    with `cls_convs[0][j].conv` (init_weights copies them; here the
    SAME flax submodule is applied to every level), while the per-level
    norms keep their own parameters.  Norm layers here are frozen-stats
    affine pairs (the framework's FrozenBN convention).
    """
    num_classes: int = 16          # includes background
    num_ins: int = 5
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    num_anchors: int = 9
    prior_prob: float = 0.01
    with_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @property
    def cls_out_channels(self):
        return self.num_classes - 1  # sigmoid head

    @nn.compact
    def __call__(self, feats):
        assert len(feats) == self.num_ins
        # all convs init at normal(0.01) (retina_sepbn_head.py)
        w_init = nn.initializers.normal(0.01)
        cls_tower = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             use_bias=not self.with_norm,
                             kernel_init=w_init,
                             dtype=self.dtype, name=f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        reg_tower = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             use_bias=not self.with_norm,
                             kernel_init=w_init,
                             dtype=self.dtype, name=f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        bias_init = nn.initializers.constant(
            -math.log((1 - self.prior_prob) / self.prior_prob))
        cls_head = nn.Conv(self.num_anchors * self.cls_out_channels, (3, 3),
                           padding=1, kernel_init=w_init,
                           bias_init=bias_init, dtype=self.dtype,
                           name="retina_cls")
        reg_head = nn.Conv(self.num_anchors * 4, (3, 3), padding=1,
                           kernel_init=w_init,
                           dtype=self.dtype, name="retina_reg")

        def norm(x, name):
            # separate per-level affine (SepBN's point: norms are NOT
            # shared across levels)
            scale = self.param(f"{name}_scale",
                               nn.initializers.ones, (x.shape[-1],),
                               jnp.float32)
            bias = self.param(f"{name}_bias",
                              nn.initializers.zeros, (x.shape[-1],),
                              jnp.float32)
            return x * scale.astype(x.dtype) + bias.astype(x.dtype)

        cls_out, reg_out = [], []
        for lvl, f in enumerate(feats):
            c = r = f
            for i, (conv_c, conv_r) in enumerate(zip(cls_tower, reg_tower)):
                c = conv_c(c)
                r = conv_r(r)
                if self.with_norm:
                    c = norm(c, f"cls_bn_l{lvl}_{i}")
                    r = norm(r, f"reg_bn_l{lvl}_{i}")
                c = nn.relu(c)
                r = nn.relu(r)
            cls_out.append(cls_head(c))
            reg_out.append(reg_head(r))
        return cls_out, reg_out
