"""Single-stage detectors (parity: mmdet/models/detectors/
single_stage.py:10-85 + retinanet.py): backbone → neck → dense head;
loss via focal + smooth-L1 on all anchors (no sampling)."""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.anchors import build_pyramid_anchors
from ..builder import build_backbone, build_head, build_neck
from ..heads.anchor_head import (anchor_head_bboxes, anchor_head_loss,
                                 flatten_level_outputs)
from ..losses import FocalLoss, SmoothL1Loss
from ..registry import DETECTORS

DEFAULT_TRAIN_CFG = dict(
    assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0),
    allowed_border=-1, pos_weight=-1)
DEFAULT_TEST_CFG = dict(nms_pre=1000, score_thr=0.05, nms_thr=0.5,
                        max_per_img=100)


@DETECTORS.register
class SingleStageDetector(nn.Module):
    backbone: Any = None
    neck: Any = None
    bbox_head: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    img_size: int = 1024
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    anchor_scales: Sequence[float] = (4, 5.0396842, 6.3496042)
    anchor_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    target_means: Sequence[float] = (0., 0., 0., 0.)
    target_stds: Sequence[float] = (1., 1., 1., 1.)
    # 'standard' anchor-target loss, or 'free_anchor' bag likelihood
    # (free_anchor_retina_head.py; configs/free_anchor/*)
    loss_type: str = "standard"
    free_anchor_cfg: Any = None
    # config-pluggable losses (parity: anchor_head.py:42-60 loss_cls/
    # loss_bbox dicts + the sampling switch keyed on the loss type);
    # None keeps the RetinaNet defaults (FocalLoss / SmoothL1(0.11))
    loss_cls: Any = None
    loss_bbox: Any = None
    # rotated single-stage (BASELINE config #2 — RetinaNet theta-OBB):
    # the head regresses the codec's deltas against the axis-aligned
    # anchors; predict decodes + TRUE rotated NMS. The head's reg_dim
    # must equal the codec dim (5 thetaobb / 8 pointobb / 5 hobb).
    with_rbox: bool = False
    rbox_encode: str = "thetaobb"
    rnms_thr: float = 0.1
    # on-device normalization for uint8 inputs (models/preprocess.py)
    img_norm: Any = None
    dtype: Any = jnp.float32

    def setup(self):
        self._backbone = build_backbone(self.backbone or dict(
            type="ResNet", depth=50, dtype=self.dtype))
        self._neck = build_neck(self.neck or dict(
            type="FPN", num_outs=5, start_level=1,
            add_extra_convs=True, dtype=self.dtype))
        self._head = build_head(self.bbox_head or dict(
            type="RetinaHead", num_classes=16,
            num_anchors=len(self.anchor_scales) * len(self.anchor_ratios),
            dtype=self.dtype))
        anchors, sizes = build_pyramid_anchors(
            self.img_size, self.strides,
            base_sizes=[s // 2 for s in self.strides],
            scales=self.anchor_scales, ratios=self.anchor_ratios)
        self._anchors = anchors
        self._level_sizes = sizes
        tc = dict(DEFAULT_TRAIN_CFG)
        tc.update(self.train_cfg or {})
        self._tc = tc
        ec = dict(DEFAULT_TEST_CFG)
        ec.update(self.test_cfg or {})
        self._ec = ec
        from ..builder import build_loss
        cls_cfg = dict(self.loss_cls or dict(
            type="FocalLoss", gamma=2.0, alpha=0.25))
        if not cls_cfg.get("use_sigmoid", True):
            raise ValueError(
                "SingleStageDetector heads are sigmoid-cls "
                "(cls_out_channels = num_classes - 1); "
                "use_sigmoid=False losses are not supported here")
        # NOTE: do not pop use_sigmoid — CrossEntropyLoss dispatches
        # sigmoid-vs-softmax on it, and silently dropping a True value
        # would build softmax CE over sigmoid channels
        self._cls_loss = build_loss(cls_cfg)
        self._bbox_loss = build_loss(dict(self.loss_bbox or dict(
            type="SmoothL1Loss", beta=0.11)))
        # FocalLoss/GHMC weigh all anchors (normalizer = num_pos);
        # other cls losses ride pos/neg sampling (anchor_head.py:61)
        self._sampling = cls_cfg["type"] not in ("FocalLoss", "GHMC")
        if self.with_rbox:
            from ...core.rboxes import RBBOX_CODECS
            dim = RBBOX_CODECS[self.rbox_encode][0]
            head_dim = getattr(self._head, "reg_dim", 4)
            if head_dim != dim:
                raise ValueError(
                    f"with_rbox={self.rbox_encode} needs a head with "
                    f"reg_dim={dim}, got {head_dim} — set "
                    f"bbox_head=dict(..., reg_dim={dim})")
            self._rbox_dim = dim

    def extract_feat(self, imgs):
        from ..preprocess import device_normalize
        imgs = device_normalize(imgs, self.img_norm, self.dtype)
        x = self._backbone(imgs)
        if isinstance(self._neck, (list, tuple)):
            for n in self._neck:   # stacked necks (e.g. FPN → BFP,
                x = n(x)           # configs/libra_rcnn/libra_retinanet)
            return x
        return self._neck(x)

    def __call__(self, imgs):
        feats = self.extract_feat(imgs)
        return self._head(feats)

    def _rbox_means_stds(self):
        """target_means/stds padded to the codec dim (extra dims 0/1)."""
        d = self._rbox_dim
        m = tuple(self.target_means)
        s = tuple(self.target_stds)
        if len(m) < d:
            m = m + (0.0,) * (d - len(m))
        if len(s) < d:
            s = s + (1.0,) * (d - len(s))
        return m[:d], s[:d]

    def loss(self, imgs, gt_boxes, gt_valid, gt_labels, img_shapes,
             gt_rboxes=None):
        feats = self.extract_feat(imgs)
        cls_out, reg_out = self._head(feats)
        reg_dim = getattr(self._head, "reg_dim", 4)
        cls_flat, reg_flat = flatten_level_outputs(
            cls_out, reg_out, self._head.cls_out_channels,
            box_dim=reg_dim)
        if self.with_rbox:
            if gt_rboxes is None:
                raise ValueError("with_rbox detector needs gt_rboxes")
            means, stds = self._rbox_means_stds()
            key = self.make_rng("sampling")
            return anchor_head_loss(
                cls_flat, reg_flat, self._anchors,
                gt_boxes, gt_valid, img_shapes, key,
                gt_labels=gt_labels,
                target_means=means, target_stds=stds,
                cls_loss=self._cls_loss, bbox_loss=self._bbox_loss,
                assigner_cfg=self._tc["assigner"],
                allowed_border=self._tc["allowed_border"],
                pos_weight=self._tc["pos_weight"],
                sampling=self._sampling, use_sigmoid_cls=True,
                gt_rboxes=gt_rboxes, rbox_encode=self.rbox_encode)
        if self.loss_type == "free_anchor":
            from ..heads.free_anchor import free_anchor_loss
            return free_anchor_loss(
                cls_flat, reg_flat, self._anchors,
                gt_boxes, gt_valid, gt_labels,
                num_classes=self._head.cls_out_channels,
                target_means=tuple(self.target_means),
                target_stds=tuple(self.target_stds),
                **(self.free_anchor_cfg or {}))
        key = self.make_rng("sampling")
        return anchor_head_loss(
            cls_flat, reg_flat, self._anchors,
            gt_boxes, gt_valid, img_shapes, key,
            gt_labels=gt_labels,
            target_means=tuple(self.target_means),
            target_stds=tuple(self.target_stds),
            cls_loss=self._cls_loss, bbox_loss=self._bbox_loss,
            assigner_cfg=self._tc["assigner"],
            allowed_border=self._tc["allowed_border"],
            pos_weight=self._tc["pos_weight"],
            sampling=self._sampling, use_sigmoid_cls=True)

    def predict(self, imgs, img_shapes, scale_factors=None):
        feats = self.extract_feat(imgs)
        cls_out, reg_out = self._head(feats)
        reg_dim = getattr(self._head, "reg_dim", 4)
        cls_flat, reg_flat = flatten_level_outputs(
            cls_out, reg_out, self._head.cls_out_channels,
            box_dim=reg_dim)
        if self.with_rbox:
            from ..heads.anchor_head import anchor_head_rboxes
            means, stds = self._rbox_means_stds()
            res, rboxes = anchor_head_rboxes(
                cls_flat, reg_flat, self._anchors, self._level_sizes,
                img_shapes, encode=self.rbox_encode,
                nms_pre=self._ec["nms_pre"],
                score_thr=self._ec["score_thr"],
                nms_thr=self._ec.get("rnms_thr", self.rnms_thr),
                max_per_img=self._ec["max_per_img"],
                target_means=means, target_stds=stds,
                rescale_factors=scale_factors)
            # HBB view of the kept quads for the HBB eval task
            from ...core.rboxes import pointobb2bbox
            hbb = pointobb2bbox(res.boxes)
            return dict(boxes=hbb, scores=res.scores, labels=res.labels,
                        valid=res.valid, rboxes=rboxes)
        from ...ops.nms import nms_cfg_kwargs
        res = anchor_head_bboxes(
            cls_flat, reg_flat, self._anchors, self._level_sizes,
            img_shapes,
            nms_pre=self._ec["nms_pre"], score_thr=self._ec["score_thr"],
            nms_thr=self._ec["nms_thr"],
            max_per_img=self._ec["max_per_img"],
            target_means=tuple(self.target_means),
            target_stds=tuple(self.target_stds),
            use_sigmoid_cls=True, rescale_factors=scale_factors,
            nms_kwargs=nms_cfg_kwargs(self._ec))
        return dict(boxes=res.boxes, scores=res.scores, labels=res.labels,
                    valid=res.valid)


@DETECTORS.register(name="RetinaNet")
def RetinaNet(**kwargs):
    return SingleStageDetector(**kwargs)


@DETECTORS.register(name="RetinaNetOBB")
def RetinaNetOBB(**kwargs):
    """Rotated RetinaNet (BASELINE config #2: theta-based OBB on DOTA
    with rotated NMS) — the head regresses a rotated codec's deltas
    against axis-aligned anchors; no reference counterpart (aidet only
    had two-stage OBB detectors)."""
    kwargs.setdefault("with_rbox", True)
    return SingleStageDetector(**kwargs)


@DETECTORS.register(name="FreeAnchorRetinaNet")
def FreeAnchorRetinaNet(**kwargs):
    """RetinaNet trained with the FreeAnchor bag likelihood
    (free_anchor_retina_head.py; target_stds 0.1/0.2 per the
    configs/free_anchor configs)."""
    kwargs.setdefault("loss_type", "free_anchor")
    kwargs.setdefault("target_stds", (0.1, 0.1, 0.2, 0.2))
    return SingleStageDetector(**kwargs)
