"""Cascade R-CNN and Hybrid Task Cascade.

Parity targets:
  - CascadeRCNN (mmdet/models/detectors/cascade_rcnn.py): three RoI
    stages with increasing IoU thresholds; each stage refines the boxes
    fed to the next; test-time class scores are averaged across stages.
  - HTC (mmdet/models/detectors/htc.py:1-517): per-stage mask heads
    with mask information flow (htc_mask_head.py), interleaved
    execution (mask branch trained on the boxes refined by the current
    stage), optional semantic branch fused into box AND mask RoI
    features, and stage-averaged mask ensembling at test time.

TPU-native design: one jit program — assignment/sampling/RoIAlign are
vmapped over the padded batch, stages unroll statically, the info-flow
chain is a static Python loop over flax submodules.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.anchors import build_pyramid_anchors
from ...core.assign import max_iou_assign
from ...core.boxes import delta2bbox
from ...core.sample import sample_fixed
from ...core.targets import bbox_target, mask_target
from ...ops.nms import multiclass_nms
from ...ops.roi_align import multilevel_roi_align_fused
from ..builder import (build_backbone, build_head, build_neck,
                       build_shared_head)
from ..heads.anchor_head import (anchor_head_loss, flatten_level_outputs,
                                 rpn_proposals)
from ..losses import CrossEntropyLoss, SmoothL1Loss, mask_cross_entropy
from ..registry import DETECTORS
from .two_stage import (DEFAULT_TEST_CFG, DEFAULT_TRAIN_CFG,
                        RPN_TARGET_STDS, _merge)

STAGE_IOU_THRS = (0.5, 0.6, 0.7)
STAGE_LOSS_WEIGHTS = (1.0, 0.5, 0.25)
STAGE_TARGET_STDS = ((0.1, 0.1, 0.2, 0.2),
                     (0.05, 0.05, 0.1, 0.1),
                     (0.033, 0.033, 0.067, 0.067))


@DETECTORS.register
class CascadeRCNN(nn.Module):
    backbone: Any = None
    neck: Any = None
    rpn_head: Any = None
    bbox_head: Any = None          # template config reused per stage
    # C4-style res5 shared RoI head applied (per stage) to roi crops
    # before the bbox/mask heads (cascade_rcnn_r50_caffe_c4_1x.py)
    shared_head: Any = None
    mask_head: Any = None          # mask branch (optional)
    per_stage_masks: bool = False  # HTC: one mask head per stage
    interleaved: bool = False      # HTC: mask trains on refined boxes
    mask_info_flow: bool = False   # HTC: res-feat chain between stages
    semantic_head: Any = None      # HTC semantic branch (optional)
    semantic_fusion: Sequence[str] = ("bbox", "mask")
    semantic_level: int = 1        # pyramid level of the fused feature
    num_stages: int = 3
    train_cfg: Any = None
    test_cfg: Any = None
    img_size: int = 1024
    strides: Sequence[int] = (4, 8, 16, 32, 64)
    anchor_scales: Sequence[int] = (8,)
    anchor_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    # on-device normalization for uint8 inputs (models/preprocess.py)
    img_norm: Any = None
    dtype: Any = jnp.float32

    def setup(self):
        self._backbone = build_backbone(self.backbone or dict(
            type="ResNet", depth=50, dtype=self.dtype))
        self._neck = build_neck(self.neck or dict(
            type="FPN", num_outs=5, dtype=self.dtype))
        self._rpn = build_head(self.rpn_head or dict(
            type="RPNHead", num_anchors=len(self.anchor_scales)
            * len(self.anchor_ratios), dtype=self.dtype))
        head_cfg = dict(self.bbox_head or dict(
            type="SharedFCBBoxHead", num_classes=16, dtype=self.dtype))
        head_cfg["reg_class_agnostic"] = True  # cascade convention
        self._heads = [build_head(dict(head_cfg))
                       for _ in range(self.num_stages)]
        self._shared_head = (build_shared_head(dict(self.shared_head))
                             if self.shared_head else None)
        self._pool_mul = (self._shared_head.stride
                          if self._shared_head is not None else 1)
        if self.mask_head:
            n = self.num_stages if self.per_stage_masks else 1
            self._mask_heads = [build_head(dict(self.mask_head))
                                for _ in range(n)]
        else:
            self._mask_heads = None
        self._semantic_head = (build_head(self.semantic_head)
                               if self.semantic_head else None)
        anchors, sizes = build_pyramid_anchors(
            self.img_size, self.strides,
            scales=self.anchor_scales, ratios=self.anchor_ratios)
        self._anchors = anchors
        self._level_sizes = sizes
        self._tc = _merge(DEFAULT_TRAIN_CFG, self.train_cfg)
        self._ec = _merge(DEFAULT_TEST_CFG, self.test_cfg)
        self._rpn_cls_loss = CrossEntropyLoss(use_sigmoid=True)
        self._rpn_bbox_loss = SmoothL1Loss(beta=1.0 / 9.0)
        self._cls_loss = CrossEntropyLoss()
        self._reg_loss = SmoothL1Loss(beta=1.0)

    def extract_feat(self, imgs):
        from ..preprocess import device_normalize
        imgs = device_normalize(imgs, self.img_norm, self.dtype)
        return self._neck(self._backbone(imgs))

    def _roi_features(self, feats, rois_b, out_size):
        from ...ops.roi_align import batched_multilevel_roi_align
        return batched_multilevel_roi_align(
            list(feats[:4]), rois_b, out_size=out_size,
            featmap_strides=tuple(self.strides[:4]))

    def _apply_shared(self, crops):
        """res5 shared head over [B, R, s, s, C] roi crops (C4
        cascades; parity: cascade_rcnn.py bbox branch via ResLayer)."""
        if self._shared_head is None:
            return crops
        b, r = crops.shape[:2]
        out = self._shared_head(
            crops.reshape((b * r,) + crops.shape[2:]))
        return out.reshape((b, r) + out.shape[1:])

    def _fuse_semantic(self, crops, sem_feat, rois_b, out_size):
        """RoI-crop the semantic feature and sum into roi feats
        (htc.py:57-64, 88-95: element-wise sum)."""
        from ...ops.roi_align import roi_align
        stride = self.strides[self.semantic_level]

        def per_image(sf, rois):
            return roi_align(sf, rois, out_size, 1.0 / stride)
        return crops + jax.vmap(per_image)(sem_feat, rois_b)

    def _mask_forward(self, stage, mask_feats):
        """Run the stage's mask head with mask information flow
        (htc.py:97-106): previous heads are forwarded trunk-only to
        build the res-feat chain."""
        if not self.mask_info_flow or not self.per_stage_masks:
            head = self._mask_heads[min(stage,
                                        len(self._mask_heads) - 1)]
            out = head(mask_feats)
            return out[0] if isinstance(out, tuple) else out
        last_feat = None
        for j in range(stage):
            last_feat = self._mask_heads[j](
                mask_feats, last_feat, return_logits=False,
                return_feat=True)
        return self._mask_heads[stage](mask_feats, last_feat,
                                       return_logits=True,
                                       return_feat=False)

    def __call__(self, imgs):
        feats = self.extract_feat(imgs)
        rpn_out = self._rpn(feats)
        dummy = jnp.tile(jnp.asarray([[0., 0., 64., 64.]], self.dtype),
                         (4, 1))
        sem_feat = None
        if self._semantic_head is not None:
            _, sem_feat = self._semantic_head(feats)
        crops = multilevel_roi_align_fused(
            [f[0] for f in feats[:4]], dummy,
            out_size=self._heads[0].roi_feat_size * self._pool_mul,
            featmap_strides=tuple(self.strides[:4]))
        if self._shared_head is not None:
            crops = self._shared_head(crops)
        outs = [h(crops) for h in self._heads]
        if self._mask_heads is not None:
            mcrops = multilevel_roi_align_fused(
                [f[0] for f in feats[:4]], dummy, out_size=14,
                featmap_strides=tuple(self.strides[:4]))
            if sem_feat is not None and "mask" in self.semantic_fusion:
                mcrops = self._fuse_semantic(
                    mcrops[None], sem_feat[:1], dummy[None], 14)[0]
            if self._shared_head is not None:
                mcrops = self._shared_head(mcrops)
            for stage in range(self.num_stages
                               if self.per_stage_masks else 1):
                outs.append(self._mask_forward(stage, mcrops))
        return rpn_out, outs

    # ------------------------------------------------------------------
    def _sample_stage(self, cand, cand_valid, gt_boxes, gt_valid, thr,
                      num_samples, pos_fraction, neg_pos_ub, keys):
        def sample_one(cand_i, cv_i, gt_i, gv_i, k):
            res = max_iou_assign(cand_i, gt_i, gv_i, None,
                                 pos_iou_thr=thr, neg_iou_thr=thr,
                                 min_pos_iou=thr, box_valid=cv_i)
            return sample_fixed(k, res.gt_inds, num_samples,
                                pos_fraction, neg_pos_ub)
        sample = jax.vmap(sample_one)(cand, cand_valid, gt_boxes,
                                      gt_valid, keys)
        rois = jnp.take_along_axis(cand, sample.inds[..., None], axis=1)
        return sample, rois

    def _mask_loss_stage(self, stage, feats, sem_feat, sample, rois,
                         gt_masks, gt_labels, p_max):
        b = rois.shape[0]
        pos_rois = rois[:, :p_max]
        pos_sample = jax.tree.map(lambda x: x[:, :p_max], sample)
        mcrops = self._roi_features(feats, pos_rois, 14)
        if sem_feat is not None and "mask" in self.semantic_fusion:
            mcrops = self._fuse_semantic(mcrops, sem_feat, pos_rois, 14)
        mcrops = self._apply_shared(mcrops)
        flat = mcrops.reshape((b * p_max,) + mcrops.shape[2:])
        mask_pred = self._mask_forward(stage, flat)
        # target size = actual head output resolution (a C4 shared
        # head shrinks the 14-crop to 7 before the mask head)
        msize = mask_pred.shape[1]
        mscale = gt_masks.shape[-1] / self.img_size
        mtgt = jax.vmap(lambda s, ro, m: mask_target(
            s, ro * mscale, m, msize))(pos_sample, pos_rois, gt_masks)
        mtgt = mtgt.reshape((b * p_max,) + mtgt.shape[2:])
        pos_labels = jax.vmap(
            lambda s, gl: jnp.where(
                s.is_pos, gl[jnp.clip(s.gt_inds, 0, gl.shape[0] - 1)],
                0))(pos_sample, gt_labels).reshape(-1)
        is_pos = pos_sample.is_pos.reshape(-1)
        navg = jnp.maximum(is_pos.sum(), 1.0) * msize ** 2
        return mask_cross_entropy(
            mask_pred, mtgt, pos_labels,
            weight=is_pos[:, None, None].astype(jnp.float32),
            avg_factor=navg)

    def loss(self, imgs, gt_boxes, gt_valid, gt_labels, img_shapes,
             gt_masks=None, gt_semantic=None):
        # mask targets may arrive uint8-quantized (pipeline transfer
        # path; see TwoStageDetector.loss)
        if gt_masks is not None and gt_masks.dtype == jnp.uint8:
            gt_masks = gt_masks.astype(jnp.float32) / 255.0
        tc = self._tc
        feats = self.extract_feat(imgs)
        rpn_cls, rpn_reg = self._rpn(feats)
        cls_flat, reg_flat = flatten_level_outputs(
            rpn_cls, rpn_reg, self._rpn.cls_out_channels)
        key = self.make_rng("sampling")
        keys = jax.random.split(key, 2 * self.num_stages + 1)

        rpn_cfg = dict(tc["rpn"])
        losses = {}
        rpn_losses = anchor_head_loss(
            cls_flat, reg_flat, self._anchors, gt_boxes, gt_valid,
            img_shapes, keys[0], target_stds=RPN_TARGET_STDS,
            cls_loss=self._rpn_cls_loss, bbox_loss=self._rpn_bbox_loss,
            assigner_cfg=dict(pos_iou_thr=rpn_cfg["pos_iou_thr"],
                              neg_iou_thr=rpn_cfg["neg_iou_thr"],
                              min_pos_iou=rpn_cfg["min_pos_iou"]),
            sampler_cfg=dict(num_samples=rpn_cfg["num_samples"],
                             pos_fraction=rpn_cfg["pos_fraction"],
                             neg_pos_ub=rpn_cfg["neg_pos_ub"]),
            allowed_border=rpn_cfg["allowed_border"],
            pos_weight=rpn_cfg["pos_weight"], use_sigmoid_cls=True)
        losses["loss_rpn_cls"] = rpn_losses["loss_cls"]
        losses["loss_rpn_bbox"] = rpn_losses["loss_bbox"]

        props, _, prop_valid = rpn_proposals(
            jax.lax.stop_gradient(cls_flat),
            jax.lax.stop_gradient(reg_flat),
            self._anchors, self._level_sizes, img_shapes,
            **tc["rpn_proposal"])

        sem_feat = None
        if self._semantic_head is not None:
            seg_logits, sem_feat = self._semantic_head(feats)
            if gt_semantic is not None:
                from ..heads.semantic_head import semantic_loss
                sh = self._semantic_head
                losses["loss_semantic_seg"] = semantic_loss(
                    seg_logits, gt_semantic,
                    loss_weight=getattr(sh, "loss_weight", 0.2),
                    use_focal=getattr(sh, "use_focal", False))

        rc = tc["rcnn"]
        b = imgs.shape[0]
        r = rc["num_samples"]
        p_max = int(r * rc["pos_fraction"])
        cur_boxes = props
        cur_valid = prop_valid
        last_sample = None
        last_rois = None
        for stage in range(self.num_stages):
            thr = STAGE_IOU_THRS[stage]
            lw = STAGE_LOSS_WEIGHTS[stage]
            stds = STAGE_TARGET_STDS[stage]
            cand = jnp.concatenate([gt_boxes, cur_boxes], axis=1)
            cand_valid = jnp.concatenate([gt_valid, cur_valid], axis=1)
            skeys = jax.random.split(keys[stage + 1], b)
            sample, rois = self._sample_stage(
                cand, cand_valid, gt_boxes, gt_valid, thr, r,
                rc["pos_fraction"], rc["neg_pos_ub"], skeys)
            psize = self._heads[stage].roi_feat_size * self._pool_mul
            crops = self._roi_features(feats, rois, psize)
            if sem_feat is not None and "bbox" in self.semantic_fusion:
                crops = self._fuse_semantic(crops, sem_feat, rois, psize)
            crops = self._apply_shared(crops)
            flat = crops.reshape((b * r,) + crops.shape[2:])
            cls_score, bbox_pred = self._heads[stage](flat)

            tgt = jax.vmap(lambda s, ro, g, gl: bbox_target(
                s, ro, g, gl, (0., 0., 0., 0.), stds,
                rc["pos_weight"]))(sample, rois, gt_boxes, gt_labels)
            flat_tgt = jax.tree.map(
                lambda x: x.reshape((b * r,) + x.shape[2:]), tgt)
            avg = jnp.maximum(flat_tgt.label_weights.sum(), 1.0)
            losses[f"s{stage}.loss_cls"] = lw * self._cls_loss(
                cls_score, flat_tgt.labels,
                weight=flat_tgt.label_weights, avg_factor=avg)
            # regression averaged by the TOTAL sampled-roi count, like
            # BBoxHead.loss (avg_factor=bbox_targets.size(0)) and this
            # repo's bbox_head_loss — a positive-count average would
            # make every stage's reg gradient ~1/pos_fraction stronger
            losses[f"s{stage}.loss_bbox"] = lw * self._reg_loss(
                bbox_pred, flat_tgt.bbox_targets,
                weight=flat_tgt.bbox_weights, avg_factor=avg)

            # refined boxes (no grad), clipped to per-image shapes
            refined = None
            if stage < self.num_stages - 1 or (
                    self._mask_heads is not None and self.interleaved):
                pred_b = jax.lax.stop_gradient(
                    bbox_pred).reshape(b, r, -1)
                refined = jax.vmap(
                    lambda ro, pr, sh: delta2bbox(
                        ro, pr, (0., 0., 0., 0.), stds, max_shape=sh))(
                    rois, pred_b, img_shapes)

            # HTC per-stage mask branch
            if (self._mask_heads is not None and self.per_stage_masks
                    and gt_masks is not None):
                if self.interleaved:
                    # interleaved execution (htc.py:275-293): re-assign
                    # and re-sample on the refined boxes
                    mcand = jnp.concatenate([gt_boxes, refined], axis=1)
                    mcand_valid = jnp.concatenate(
                        [gt_valid, sample.valid], axis=1)
                    mkeys = jax.random.split(
                        keys[self.num_stages + stage + 1], b)
                    msample, mrois = self._sample_stage(
                        mcand, mcand_valid, gt_boxes, gt_valid, thr, r,
                        rc["pos_fraction"], rc["neg_pos_ub"], mkeys)
                else:
                    msample, mrois = sample, rois
                losses[f"s{stage}.loss_mask"] = lw * self._mask_loss_stage(
                    stage, feats, sem_feat, msample, mrois, gt_masks,
                    gt_labels, p_max)

            last_sample, last_rois = sample, rois
            if stage < self.num_stages - 1:
                cur_boxes = refined
                cur_valid = sample.valid

        # single-mask-head variant (Cascade-Mask R-CNN): mask on the
        # last stage's sampling results
        if (self._mask_heads is not None and not self.per_stage_masks
                and gt_masks is not None):
            losses["loss_mask"] = self._mask_loss_stage(
                0, feats, sem_feat, last_sample, last_rois, gt_masks,
                gt_labels, p_max)
        return losses

    def predict(self, imgs, img_shapes, scale_factors=None):
        ec = self._ec
        feats = self.extract_feat(imgs)
        rpn_cls, rpn_reg = self._rpn(feats)
        cls_flat, reg_flat = flatten_level_outputs(
            rpn_cls, rpn_reg, self._rpn.cls_out_channels)
        props, _, prop_valid = rpn_proposals(
            cls_flat, reg_flat, self._anchors, self._level_sizes,
            img_shapes, **ec["rpn"])
        b, p = props.shape[:2]

        sem_feat = None
        if self._semantic_head is not None:
            _, sem_feat = self._semantic_head(feats)

        rois = props
        ms_scores = []
        bbox_pred = None
        for stage in range(self.num_stages):
            psize = self._heads[stage].roi_feat_size * self._pool_mul
            crops = self._roi_features(feats, rois, psize)
            if sem_feat is not None and "bbox" in self.semantic_fusion:
                crops = self._fuse_semantic(crops, sem_feat, rois, psize)
            crops = self._apply_shared(crops)
            flat = crops.reshape((b * p,) + crops.shape[2:])
            cls_score, bbox_pred = self._heads[stage](flat)
            ms_scores.append(jax.nn.softmax(
                cls_score.reshape(b, p, -1), -1))
            if stage < self.num_stages - 1:
                rois = jax.vmap(
                    lambda ro, pr, sh: delta2bbox(
                        ro, pr, (0., 0., 0., 0.),
                        STAGE_TARGET_STDS[stage], max_shape=sh))(
                    rois, bbox_pred.reshape(b, p, -1), img_shapes)

        scores = sum(ms_scores) / self.num_stages
        final = jax.vmap(
            lambda ro, pr, sh: delta2bbox(
                ro, pr, (0., 0., 0., 0.), STAGE_TARGET_STDS[-1],
                max_shape=sh))(
            rois, bbox_pred.reshape(b, p, -1), img_shapes)
        rc = ec["rcnn"]

        def one(boxes_i, scores_i, valid_i):
            from ...ops.nms import nms_cfg_kwargs
            return multiclass_nms(boxes_i, scores_i, rc["score_thr"],
                                  max_num=rc["max_per_img"],
                                  valid=valid_i, **nms_cfg_kwargs(rc))
        dets = jax.vmap(one)(final, scores, prop_valid)
        out = dict(boxes=dets.boxes, scores=dets.scores,
                   labels=dets.labels, valid=dets.valid)

        # mask branch on the detections: run every stage's mask head
        # (with info flow) and average the sigmoided predictions
        # (htc.py:359-383 merge_aug_masks == plain mean without TTA)
        if self._mask_heads is not None:
            det_rois = dets.boxes[..., :4]
            k = det_rois.shape[1]
            mcrops = self._roi_features(feats, det_rois, 14)
            if sem_feat is not None and "mask" in self.semantic_fusion:
                mcrops = self._fuse_semantic(mcrops, sem_feat,
                                             det_rois, 14)
            mcrops = self._apply_shared(mcrops)
            flat = mcrops.reshape((b * k,) + mcrops.shape[2:])
            preds = []
            n_mask = (self.num_stages if self.per_stage_masks else 1)
            if self.mask_info_flow and self.per_stage_masks:
                last_feat = None
                for stage in range(n_mask):
                    mp, last_feat = self._mask_heads[stage](
                        flat, last_feat, return_logits=True,
                        return_feat=True)
                    preds.append(jax.nn.sigmoid(mp))
            else:
                for stage in range(n_mask):
                    mp = self._mask_heads[stage](flat)
                    if isinstance(mp, tuple):
                        mp = mp[0]
                    preds.append(jax.nn.sigmoid(mp))
            merged = sum(preds) / len(preds)
            c = merged.shape[-1]
            lbl = jnp.clip(dets.labels.reshape(-1), 0, c - 1)
            mask_sel = jnp.take_along_axis(
                merged, lbl[:, None, None, None], axis=-1)[..., 0]
            s = mask_sel.shape[-1]
            out["masks"] = mask_sel.reshape(b, k, s, s)

        if scale_factors is not None:
            out["boxes"] = out["boxes"] / scale_factors[:, None, None]
        return out


@DETECTORS.register(name="HTC")
def HTC(**kwargs):
    """Hybrid Task Cascade (htc.py:13-517): per-stage HTC mask heads,
    interleaved execution, mask info flow; pass
    ``semantic_head=dict(type='FusedSemanticHead', ...)`` for the
    semantic branch."""
    kwargs.setdefault("mask_head", dict(type="HTCMaskHead"))
    kwargs.setdefault("per_stage_masks", True)
    kwargs.setdefault("interleaved", True)
    kwargs.setdefault("mask_info_flow", True)
    return CascadeRCNN(**kwargs)
