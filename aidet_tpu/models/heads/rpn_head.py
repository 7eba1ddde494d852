"""RPN head module (parity: mmdet/models/anchor_heads/rpn_head.py:13-38:
shared 3x3 conv + 1x1 cls/reg, sigmoid objectness)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..registry import HEADS


@HEADS.register
class RPNHead(nn.Module):
    in_channels: int = 256
    feat_channels: int = 256
    num_anchors: int = 3
    use_sigmoid_cls: bool = True
    dtype: jnp.dtype = jnp.float32

    @property
    def cls_out_channels(self):
        return 1 if self.use_sigmoid_cls else 2

    @nn.compact
    def __call__(self, feats):
        shared = nn.Conv(self.feat_channels, (3, 3), padding=1,
                         dtype=self.dtype, name="rpn_conv")
        n_cls = self.num_anchors * self.cls_out_channels
        import os
        if os.environ.get("AIDET_RPN_COMBINED", "1") == "1":
            # one 1x1 conv over the tower output instead of two: the
            # cls/reg contractions each re-read the 256-ch feature
            # from HBM and each pads its tiny output (3 / 12 ch) to an
            # MXU tile; concatenating the kernels halves both costs.
            # Per-output-channel contractions are independent, so this
            # is bitwise-identical math with the same param tree.
            from ..necks.fpn import _ConvBP
            wc, bc = _ConvBP((1, 1, self.feat_channels, n_cls),
                             name="rpn_cls")()
            wg, bg = _ConvBP((1, 1, self.feat_channels,
                              self.num_anchors * 4), name="rpn_reg")()
            w = jnp.concatenate([wc[0, 0], wg[0, 0]], -1).astype(self.dtype)
            b = jnp.concatenate([bc, bg]).astype(self.dtype)
            cls_out, reg_out = [], []
            for f in feats:
                h = nn.relu(shared(f))
                o = jnp.einsum("bhwc,co->bhwo", h, w) + b
                cls_out.append(o[..., :n_cls])
                reg_out.append(o[..., n_cls:])
            return cls_out, reg_out
        cls_conv = nn.Conv(n_cls, (1, 1),
                           dtype=self.dtype, name="rpn_cls")
        reg_conv = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                           name="rpn_reg")
        cls_out, reg_out = [], []
        for f in feats:
            h = nn.relu(shared(f))
            cls_out.append(cls_conv(h))
            reg_out.append(reg_conv(h))
        return cls_out, reg_out
