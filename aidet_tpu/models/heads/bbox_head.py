"""RoI box heads: classification + box regression over roi features.

TPU-native rework of the reference heads:
  - BBoxHead / SharedFCBBoxHead (mmdet/models/bbox_heads/bbox_head.py:14,
    convfc_bbox_head.py:9-175): avg-pool / shared FCs + cls/reg linears.
  - RBBoxHead (mmdet/models/bbox_heads/rbbox_head.py:17-297): shared
    conv+fc trunk, per-class rotated regression with encode-dispatched
    output dim (5 for theta/h, 8 for point).

The heads are flax modules over [B*R, h, w, C] roi crops; decode /
loss are pure functions in this file.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.boxes import delta2bbox
from ...core.rboxes import RBBOX_CODECS
from ..registry import HEADS


@HEADS.register
class BBoxHead(nn.Module):
    """Simplest head: avg pool + cls/reg linear (bbox_head.py:14-79)."""
    num_classes: int = 81           # includes background
    in_channels: int = 256
    roi_feat_size: int = 7
    with_avg_pool: bool = False
    reg_class_agnostic: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [N, s, s, C]
        if self.with_avg_pool:
            x = x.mean(axis=(1, 2))
        else:
            x = x.reshape(x.shape[0], -1)
        cls_score = nn.Dense(self.num_classes, dtype=self.dtype,
                             name="fc_cls")(x)
        out_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        bbox_pred = nn.Dense(out_dim, dtype=self.dtype, name="fc_reg")(x)
        return cls_score, bbox_pred


@HEADS.register
@HEADS.register(name="ConvFCBBoxHead")
class SharedFCBBoxHead(nn.Module):
    """Shared convs (optional, the 4conv1fc GN variant) + shared FCs
    then cls/reg (convfc_bbox_head.py:175 SharedFCBBoxHead and :16
    ConvFCBBoxHead with num_shared_convs, the standard Faster R-CNN
    head and the configs/gn 4conv1fc head)."""
    num_classes: int = 81
    in_channels: int = 256
    fc_out_channels: int = 1024
    num_fcs: int = 2
    num_shared_convs: int = 0
    conv_out_channels: int = 256
    # dict(type='GN', num_groups=32) after each shared conv (configs/gn)
    norm_cfg: dict | None = None
    roi_feat_size: int = 7
    reg_class_agnostic: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.num_shared_convs:
            from ..backbones.resnet import make_norm
            for i in range(self.num_shared_convs):
                x = nn.Conv(self.conv_out_channels, (3, 3), padding=1,
                            use_bias=self.norm_cfg is None,
                            dtype=self.dtype, name=f"shared_conv{i}")(x)
                if self.norm_cfg is not None:
                    x = make_norm(self.norm_cfg, self.dtype,
                                  f"shared_norm{i}")(x)
                x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype,
                                 name=f"shared_fc{i}")(x))
        cls_score = nn.Dense(self.num_classes, dtype=self.dtype,
                             name="fc_cls")(x)
        out_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        bbox_pred = nn.Dense(out_dim, dtype=self.dtype, name="fc_reg")(x)
        return cls_score, bbox_pred


@HEADS.register
class RBBoxHead(nn.Module):
    """Rotated-box head: shared conv/fc trunk → cls + per-class OBB
    regression (rbbox_head.py:76-156).

    ``encode`` picks the output dim: thetaobb/hobb → 5, pointobb → 8
    (rbbox_head.py out_dim_reg).
    """
    num_classes: int = 16
    in_channels: int = 256
    num_shared_convs: int = 0
    num_shared_fcs: int = 2
    conv_out_channels: int = 256
    fc_out_channels: int = 1024
    roi_feat_size: int = 7
    encode: str = "thetaobb"
    reg_class_agnostic: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def out_dim_reg(self):
        return RBBOX_CODECS[self.encode][0]

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_shared_convs):
            x = nn.relu(nn.Conv(self.conv_out_channels, (3, 3), padding=1,
                                dtype=self.dtype, name=f"shared_conv{i}")(x))
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_shared_fcs):
            x = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype,
                                 name=f"shared_fc{i}")(x))
        cls_score = nn.Dense(self.num_classes, dtype=self.dtype,
                             name="fc_cls")(x)
        d = self.out_dim_reg
        out_dim = d if self.reg_class_agnostic else d * self.num_classes
        rbbox_pred = nn.Dense(out_dim, dtype=self.dtype, name="fc_reg")(x)
        return cls_score, rbbox_pred


@HEADS.register
class DoubleConvFCBBoxHead(nn.Module):
    """Double-Head R-CNN box head (parity: mmdet/models/bbox_heads/
    double_bbox_head.py): conv branch (residual blocks) for regression,
    fc branch for classification."""
    num_classes: int = 81
    in_channels: int = 256
    num_convs: int = 4
    num_fcs: int = 2
    conv_out_channels: int = 1024
    fc_out_channels: int = 1024
    roi_feat_size: int = 7
    reg_class_agnostic: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # conv branch → regression
        c = nn.Conv(self.conv_out_channels, (1, 1), dtype=self.dtype,
                    name="conv_in")(x)
        for i in range(self.num_convs):
            res = nn.relu(nn.Conv(self.conv_out_channels // 4, (1, 1),
                                  dtype=self.dtype,
                                  name=f"res{i}_reduce")(c))
            res = nn.relu(nn.Conv(self.conv_out_channels // 4, (3, 3),
                                  padding=1, dtype=self.dtype,
                                  name=f"res{i}_conv")(res))
            res = nn.Conv(self.conv_out_channels, (1, 1),
                          dtype=self.dtype, name=f"res{i}_expand")(res)
            c = nn.relu(c + res)
        c = c.mean(axis=(1, 2))
        out_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        bbox_pred = nn.Dense(out_dim, dtype=self.dtype, name="fc_reg")(c)

        # fc branch → classification
        f = x.reshape(x.shape[0], -1)
        for i in range(self.num_fcs):
            f = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype,
                                 name=f"cls_fc{i}")(f))
        cls_score = nn.Dense(self.num_classes, dtype=self.dtype,
                             name="fc_cls")(f)
        return cls_score, bbox_pred


@HEADS.register
class MaskIoUHead(nn.Module):
    """Mask-IoU prediction head (parity: mmdet/models/mask_heads/
    maskiou_head.py, Mask Scoring R-CNN): convs over roi feats concat
    the predicted mask, fcs → per-class mask IoU."""
    num_convs: int = 4
    num_fcs: int = 2
    in_channels: int = 256
    conv_out_channels: int = 256
    fc_out_channels: int = 1024
    num_classes: int = 81
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feat, mask_pred):
        """roi_feat: [N, s, s, C]; mask_pred: [N, 2s, 2s] (selected
        class channel, sigmoided)."""
        s = roi_feat.shape[1]
        # max_pool2d(2, 2) like the reference MaskIoUHead — a strided
        # slice would drop thin (1-px) mask structures on odd rows/cols
        n = mask_pred.shape[0]
        mp = mask_pred.reshape(n, s, 2, s, 2).max((2, 4))[..., None]
        x = jnp.concatenate([roi_feat, mp.astype(roi_feat.dtype)], -1)
        for i in range(self.num_convs):
            stride = 2 if i == self.num_convs - 1 else 1
            x = nn.relu(nn.Conv(self.conv_out_channels, (3, 3),
                                strides=(stride, stride), padding=1,
                                dtype=self.dtype, name=f"conv{i}")(x))
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype,
                                 name=f"fc{i}")(x))
        return nn.Dense(self.num_classes - 1, dtype=self.dtype,
                        name="fc_mask_iou")(x)


# ---------------------------------------------------------------------------
# functional loss / decode
# ---------------------------------------------------------------------------

def bbox_head_loss(cls_score, bbox_pred, targets, cls_loss, bbox_loss,
                   num_classes: int, reg_class_agnostic: bool = False,
                   box_dim: int = 4, alt_bbox_targets=None):
    """Second-stage loss over one batch of sampled rois.

    Parity: BBoxHead.loss (bbox_head.py:100-137): CE over all sampled
    rois averaged by their count; regression on positives only, with
    the class-specific slice of the prediction, averaged by the same
    count; RBBoxHead.loss (rbbox_head.py:214-251) is identical modulo
    box_dim.

    Args:
      cls_score: [N, C]; bbox_pred: [N, C*box_dim] or [N, box_dim].
      targets: RoiTargets with fields of leading dim N.
      alt_bbox_targets: optional [K, N, box_dim] stack of equivalent
        target hypotheses (all decoding to the same geometry); the
        regression loss becomes the per-sample min over hypotheses —
        the sort-robust hobb formulation (core/rboxes.py hobb_rolls).
    """
    avg = jnp.maximum(targets.label_weights.sum(), 1.0)
    loss_cls = cls_loss(cls_score, targets.labels,
                        weight=targets.label_weights, avg_factor=avg)

    if reg_class_agnostic:
        pred = bbox_pred
    else:
        per = bbox_pred.reshape(bbox_pred.shape[0], -1, box_dim)
        idx = jnp.clip(targets.labels, 0, per.shape[1] - 1)
        pred = jnp.take_along_axis(per, idx[:, None, None], axis=1)[:, 0]
    # Regression is averaged by the TOTAL sampled-roi count, not the
    # positive count (BBoxHead.loss uses avg_factor=bbox_targets.size(0);
    # in the padded formulation the valid-sample count is the
    # label-weight sum, since every sampled roi has label weight 1).
    if alt_bbox_targets is None:
        loss_bbox = bbox_loss(pred, targets.bbox_targets,
                              weight=targets.bbox_weights,
                              avg_factor=avg)
    else:
        elem = bbox_loss(
            jnp.broadcast_to(pred[None], alt_bbox_targets.shape),
            alt_bbox_targets, reduction_override="none")  # [K, N, D]
        best = elem.sum(-1).min(0)                        # [N]
        loss_bbox = (best * targets.bbox_weights[..., 0]).sum() / avg
    return loss_cls, loss_bbox


def bbox_head_decode(rois, cls_score, bbox_pred,
                     target_means=(0., 0., 0., 0.),
                     target_stds=(0.1, 0.1, 0.2, 0.2),
                     img_shape=None, reg_class_agnostic=False,
                     num_classes=None):
    """Decode per-class boxes + softmax scores.

    Parity: BBoxHead.get_det_bboxes (bbox_head.py:139-176) before its
    multiclass_nms call.

    Returns (boxes [N, C*4] or [N, 4], scores [N, C]).
    """
    scores = jax.nn.softmax(cls_score, axis=-1)
    boxes = delta2bbox(rois, bbox_pred, target_means, target_stds,
                       max_shape=img_shape)
    return boxes, scores


def rbbox_head_decode(rois, cls_score, rbbox_pred, encode="thetaobb",
                      target_means=None, target_stds=None):
    """Decode per-class rotated boxes + softmax scores.

    Parity: RBBoxHead.get_det_rbboxes_parallel (rbbox_head.py:253-297)
    before index selection.
    """
    dim, _, decode_fn, _ = RBBOX_CODECS[encode]
    if target_means is None:
        target_means = (0.,) * dim
    if target_stds is None:
        target_stds = (1.,) * dim
    scores = jax.nn.softmax(cls_score, axis=-1)
    rboxes = decode_fn(rois, rbbox_pred, target_means, target_stds)
    return rboxes, scores
