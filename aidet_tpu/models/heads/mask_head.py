"""Mask heads: FCN mask head + CenterMap head.

TPU-native rework of:
  - FCNMaskHead (mmdet/models/mask_heads/fcn_mask_head.py): N convs →
    2x deconv upsample → per-class 1x1 logits.
  - CenterMapHead (mmdet/models/mask_heads/centermap_head.py:13-105):
    same topology but regresses a soft centerness map (targets/255, no
    sigmoid at test time) with MSE + optional mask-weight reweighting.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..registry import HEADS


@HEADS.register
class FCNMaskHead(nn.Module):
    num_convs: int = 4
    in_channels: int = 256
    conv_out_channels: int = 256
    num_classes: int = 81           # includes background
    upsample_ratio: int = 2
    class_agnostic: bool = False
    # dict(type='GN', num_groups=32) after each conv (configs/gn)
    norm_cfg: dict | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [N, s, s, C]
        from ..backbones.resnet import make_norm
        for i in range(self.num_convs):
            x = nn.Conv(self.conv_out_channels, (3, 3), padding=1,
                        use_bias=self.norm_cfg is None,
                        dtype=self.dtype, name=f"conv{i}")(x)
            if self.norm_cfg is not None:
                x = make_norm(self.norm_cfg, self.dtype,
                              f"norm{i}")(x)
            x = nn.relu(x)
        r = self.upsample_ratio
        if r > 1:
            x = nn.relu(nn.ConvTranspose(
                self.conv_out_channels, (r, r), strides=(r, r),
                dtype=self.dtype, name="upsample")(x))
        out = 1 if self.class_agnostic else self.num_classes - 1
        return nn.Conv(out, (1, 1), dtype=self.dtype, name="conv_logits")(x)


@HEADS.register
class CenterMapHead(nn.Module):
    """CenterMap regression head (centermap_head.py:13-105). Output is
    a raw map per class; at test time it is thresholded directly (no
    sigmoid — get_seg_masks:34-47)."""
    num_convs: int = 4
    in_channels: int = 256
    conv_out_channels: int = 256
    num_classes: int = 16
    upsample_ratio: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.conv_out_channels, (3, 3), padding=1,
                                dtype=self.dtype, name=f"conv{i}")(x))
        r = self.upsample_ratio
        if r > 1:
            x = nn.relu(nn.ConvTranspose(
                self.conv_out_channels, (r, r), strides=(r, r),
                dtype=self.dtype, name="upsample")(x))
        return nn.Conv(self.num_classes - 1, (1, 1), dtype=self.dtype,
                       name="conv_logits")(x)


@HEADS.register
class HTCMaskHead(nn.Module):
    """HTC mask head with mask information flow.

    Parity: HTCMaskHead (mmdet/models/mask_heads/htc_mask_head.py:1-42):
    an FCN mask head whose conv trunk can be seeded with the previous
    stage's trunk output through a 1x1 ``conv_res`` — calling with
    ``res_feat`` adds conv_res(res_feat) to the input, and the trunk
    output (pre-upsample) is returned as this stage's res_feat for the
    next stage.
    """
    num_convs: int = 4
    in_channels: int = 256
    conv_out_channels: int = 256
    num_classes: int = 81           # includes background
    upsample_ratio: int = 2
    class_agnostic: bool = False
    with_conv_res: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_feat=None, return_logits=True,
                 return_feat=True):
        if res_feat is not None:
            assert self.with_conv_res
            res_feat = nn.relu(nn.Conv(
                self.conv_out_channels, (1, 1), dtype=self.dtype,
                name="conv_res")(res_feat))
            x = x + res_feat
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.conv_out_channels, (3, 3), padding=1,
                                dtype=self.dtype, name=f"conv{i}")(x))
        feat = x
        outs = []
        if return_logits:
            r = self.upsample_ratio
            if r > 1:
                x = nn.relu(nn.ConvTranspose(
                    self.conv_out_channels, (r, r), strides=(r, r),
                    dtype=self.dtype, name="upsample")(x))
            out = 1 if self.class_agnostic else self.num_classes - 1
            outs.append(nn.Conv(out, (1, 1), dtype=self.dtype,
                                name="conv_logits")(x))
        if return_feat:
            outs.append(feat)
        return tuple(outs) if len(outs) > 1 else outs[0]
