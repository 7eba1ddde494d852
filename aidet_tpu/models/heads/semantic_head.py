"""Semantic segmentation branches for two-stage detectors.

TPU-native rework of:
  - FusedSemanticHead (mmdet/models/mask_heads/fused_semantic_head.py:
    11-106): lateral 1x1 per level, resize-sum at a fusion level, conv
    stack → per-pixel class logits + an embedding map that RoI branches
    consume;
  - WeightedPseudoSegmentationHead (mmdet/models/mask_heads/
    wpsga_head.py:15-186, "WPSGA"): semantic-FPN scale heads with
    channel + spatial attention producing a pseudo-seg map trained
    with pixel-weighted CE (the CenterMap-Net semantic branch).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import HEADS


def _resize(x, hw):
    return jax.image.resize(x, x.shape[:1] + tuple(hw) + x.shape[-1:],
                            method="bilinear")


@HEADS.register
class FusedSemanticHead(nn.Module):
    num_ins: int = 5
    fusion_level: int = 1
    num_convs: int = 4
    in_channels: int = 256
    conv_out_channels: int = 256
    num_classes: int = 183
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        """Returns (seg_logits [B, Hf, Wf, num_classes],
        semantic_feat [B, Hf, Wf, C])."""
        ref = feats[self.fusion_level]
        hw = ref.shape[1:3]
        fused = nn.Conv(self.in_channels, (1, 1), dtype=self.dtype,
                        name=f"lateral{self.fusion_level}")(ref)
        for i, f in enumerate(feats[:self.num_ins]):
            if i == self.fusion_level:
                continue
            lat = nn.Conv(self.in_channels, (1, 1), dtype=self.dtype,
                          name=f"lateral{i}")(f)
            fused = fused + _resize(lat, hw)
        x = fused
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.conv_out_channels, (3, 3), padding=1,
                                dtype=self.dtype, name=f"conv{i}")(x))
        embedding = nn.relu(nn.Conv(self.conv_out_channels, (1, 1),
                                    dtype=self.dtype,
                                    name="conv_embedding")(x))
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                         name="conv_logits")(x)
        return logits, embedding


class ChannelAttention(nn.Module):
    """Squeeze-excite style channel gate (wpsga attention component)."""
    reduction: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = x.mean(axis=(1, 2))                       # [B, C]
        g = nn.relu(nn.Dense(max(c // self.reduction, 4),
                             dtype=self.dtype, name="fc1")(g))
        g = jax.nn.sigmoid(nn.Dense(c, dtype=self.dtype, name="fc2")(g))
        return x * g[:, None, None, :]


class SpatialAttention(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.concatenate([x.mean(-1, keepdims=True),
                             x.max(-1, keepdims=True)], -1)
        s = jax.nn.sigmoid(nn.Conv(1, (7, 7), padding=3,
                                   dtype=self.dtype, name="conv")(s))
        return x * s


@HEADS.register
class WPSGAHead(nn.Module):
    """Weighted pseudo-segmentation head with global attention."""
    in_channels: int = 256
    channels: int = 128
    num_levels: int = 4
    num_classes: int = 16            # includes background at 0
    common_stride: int = 8
    with_attention: bool = True
    # loss configuration (wpsga_head.py:20-28: loss_weight=1.0,
    # use_focal_loss + gamma for the focal-ised CE)
    loss_weight: float = 1.0
    use_focal: bool = True
    focal_gamma: float = 2.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        """Returns (seg_logits [B, H0, W0, num_classes],
        semantic_feat [B, H0, W0, channels]) at the finest level."""
        hw = feats[0].shape[1:3]
        acc = None
        for i, f in enumerate(feats[:self.num_levels]):
            x = f
            # scale head: enough 3x3 convs to reach common resolution
            n_ups = max(i, 1)
            for k in range(n_ups):
                x = nn.relu(nn.Conv(self.channels, (3, 3), padding=1,
                                    dtype=self.dtype,
                                    name=f"scale{i}_conv{k}")(x))
                if x.shape[1] != hw[0]:
                    x = _resize(x, hw)
            acc = x if acc is None else acc + x
        if self.with_attention:
            acc = ChannelAttention(dtype=self.dtype, name="ca")(acc)
            acc = SpatialAttention(dtype=self.dtype, name="sa")(acc)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                         name="predictor")(acc)
        return logits, acc


def semantic_loss(seg_logits, gt_seg, weight_map=None, ignore_label=255,
                  loss_weight=0.2, use_focal=False, focal_gamma=2.0):
    """Pixel CE with optional focal modulation and per-pixel reweighting.

    Parity: FusedSemanticHead.loss (CE, ignore 255, weight 0.2) and the
    WPSGA weighted variant (wpsga_head.py:173-189): per-pixel CE with
    ignore_index, optionally focal-ised as -(1-pt)^gamma * log(pt);
    when a heatmap weight map is given the loss is
    mean(ce * (w + 1) * loss_weight) — the reference's uint8 maps enter
    as w/255 + 1, here the pipeline already provides w in [0, 1].

    Args:
      seg_logits: [B, H, W, C]; gt_seg: [B, Hs, Ws] int labels;
      weight_map: optional [B, Hs, Ws] in [0, 1].
    """
    h, w = seg_logits.shape[1:3]
    gt = jax.image.resize(gt_seg.astype(jnp.float32),
                          (gt_seg.shape[0], h, w),
                          method="nearest").astype(jnp.int32)
    valid = gt != ignore_label
    gt_safe = jnp.where(valid, gt, 0)
    logp = jax.nn.log_softmax(seg_logits, -1)
    ce = -jnp.take_along_axis(logp, gt_safe[..., None], -1)[..., 0]
    if use_focal:
        pt = jnp.exp(-ce)
        ce = (1.0 - pt) ** focal_gamma * ce
    ce = jnp.where(valid, ce, 0.0)
    if weight_map is not None:
        wm = jax.image.resize(weight_map, (weight_map.shape[0], h, w),
                              method="bilinear")
        # wpsga_head.py:184-186: weights = (w + 1) * loss_weight; mean
        # over all pixels (ignored pixels contribute 0)
        return (ce * (wm + 1.0) * loss_weight).mean()
    return loss_weight * ce.sum() / jnp.maximum(
        valid.astype(jnp.float32).sum(), 1.0)
