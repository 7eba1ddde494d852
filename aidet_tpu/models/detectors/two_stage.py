"""Two-stage detector family: Faster/Mask R-CNN + the OBB variants.

TPU-native redesign of the reference detectors
(mmdet/models/detectors/two_stage.py:12-353, rbbox_cnn.py:15-253,
mask_obb.py:5-31, centermap_obb.py:19-543):

- ONE jit-able train step: no per-image Python loops — assignment,
  sampling, RoIAlign and losses are vmapped over the padded batch.
- Proposals are fixed-size (max_num slots + validity), gt boxes are
  padded [B, G, ...]; the second stage samples a fixed R rois/image.
- The rotated branch (RBBoxRCNN) and mask branch (MaskRCNN/MaskOBB/
  CenterMapOBB) ride the same sampled rois; at test time the rotated
  decode reuses the HBB NMS keep provenance exactly like the
  reference's "parallel" path (rbbox_cnn.py:214-243).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.anchors import build_pyramid_anchors
from ...core.assign import max_iou_assign
from ...core.sample import sample_fixed
from ...core.targets import bbox_target, mask_target, rbbox_target
from ...core.boxes import delta2bbox
from ...ops.nms import (NEG_INF, multiclass_nms, nms,
                        nms_cfg_kwargs, select_parallel_rboxes)
from ...ops.roi_align import multilevel_roi_align_fused
from ..builder import (build_backbone, build_head, build_neck,
                       build_shared_head)
from ..heads.anchor_head import (anchor_head_loss, flatten_level_outputs,
                                 rpn_proposals)
from ..heads.bbox_head import (bbox_head_decode, bbox_head_loss,
                               rbbox_head_decode)
from ..losses import (CenterMapLoss, CrossEntropyLoss, SmoothL1Loss,
                      mask_cross_entropy)
from ..registry import DETECTORS

# defaults mirroring configs/dota/dota_v002_theta_obb_r50_v1_train.py
DEFAULT_TRAIN_CFG: dict = dict(
    rpn=dict(pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3,
             num_samples=256, pos_fraction=0.5, neg_pos_ub=-1,
             allowed_border=0, pos_weight=-1),
    rpn_proposal=dict(nms_pre=2000, nms_post=2000, max_num=2000,
                      nms_thr=0.7, min_bbox_size=0),
    rcnn=dict(pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5,
              num_samples=512, pos_fraction=0.25, neg_pos_ub=-1,
              pos_weight=-1, mask_size=28, sampler="random"),
)

DEFAULT_TEST_CFG: dict = dict(
    rpn=dict(nms_pre=2000, nms_post=2000, max_num=2000, nms_thr=0.7,
             min_bbox_size=0),
    rcnn=dict(score_thr=0.05, nms_thr=0.5, max_per_img=100),
)

RPN_TARGET_STDS = (1.0, 1.0, 1.0, 1.0)
RCNN_TARGET_MEANS = (0.0, 0.0, 0.0, 0.0)
RCNN_TARGET_STDS = (0.1, 0.1, 0.2, 0.2)


def _merge(default: dict, override) -> dict:
    from collections.abc import Mapping
    out = {k: dict(v) if isinstance(v, Mapping) else v
           for k, v in default.items()}
    for k, v in (override or {}).items():
        if isinstance(v, Mapping) and isinstance(out.get(k), dict):
            out[k].update(v)
        else:
            out[k] = v
    return out


@DETECTORS.register
class TwoStageDetector(nn.Module):
    """Configurable two-stage detector (the whole R-CNN family)."""
    backbone: Any = None
    neck: Any = None
    # C4-style shared RoI head (res5 ResLayer applied to roi crops
    # before the bbox head, faster_rcnn_r50_caffe_c4_1x.py); rois are
    # pooled at roi_feat_size x its stride so the strided res5 stage
    # lands on the bbox head's expected spatial size
    shared_head: Any = None
    rpn_head: Any = None
    bbox_head: Any = None
    rbbox_head: Any = None        # RBBoxRCNN branch
    # rotated-RoI refinement branch (BASELINE config #3): a second
    # rbbox head fed by ROTATED RoI crops of the first-stage decoded
    # rboxes, regressing 'rtheta' deltas against them
    rbbox_refine_head: Any = None
    mask_head: Any = None         # Mask R-CNN / MaskOBB / CenterMap branch
    mask_iou_head: Any = None     # Mask Scoring R-CNN branch
    grid_head: Any = None         # Grid R-CNN branch
    grid_roi_size: int = 14       # grid roi extractor output size
    semantic_head: Any = None     # CenterMap-Net semantic branch
    semantic_fusion: str = "add"  # 'add' | 'mul' | 'attention'
    semantic_level: int = 0       # pyramid level the semantic feat lives at
    train_cfg: Any = None
    test_cfg: Any = None
    img_size: int = 1024
    strides: Sequence[int] = (4, 8, 16, 32, 64)
    anchor_scales: Sequence[int] = (8,)
    anchor_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    rbbox_encode: str = "thetaobb"
    # sort-robust hobb regression: per-sample min over the 4 cyclic
    # first-edge target representations (core/rboxes.py hobb_rolls) —
    # removes the best-point-sort cliff; inference is unchanged
    hobb_robust_loss: bool = False
    ga_target_stds: Sequence[float] = (0.07, 0.07, 0.14, 0.14)
    ga_loc_filter_thr: float = 0.01
    mask_loss_type: str = "bce"   # 'bce' (Mask R-CNN) | 'centermap'
    # 'auto' resolves at trace time: Pallas kernels on TPU backends,
    # the XLA gather formulation elsewhere (CPU tests, interpret-less
    # platforms)
    roi_align_impl: str = "auto"  # 'auto' | 'xla' | 'pallas'
    # on-device normalization constants for uint8 inputs (pipelines
    # with device_normalize=True ship raw pixels; see
    # models/preprocess.py). None = ImageNet defaults.
    img_norm: Any = None
    dtype: Any = jnp.float32

    def setup(self):
        from collections.abc import Mapping

        def _dt(cfg):
            # propagate the detector-level compute dtype (the fp16
            # configs set dtype once at the top) into sub-configs that
            # do not pin their own; empty/None stay falsy so the
            # defaults below still apply
            if isinstance(cfg, Mapping) and cfg:
                c = dict(cfg)
                c.setdefault("dtype", self.dtype)
                return c
            return cfg

        self._backbone = build_backbone(_dt(self.backbone) or dict(
            type="ResNet", depth=50, dtype=self.dtype))
        self._neck = build_neck(_dt(self.neck) or dict(
            type="FPN", num_outs=5, dtype=self.dtype))
        self._ga_rpn = (isinstance(self.rpn_head, Mapping)
                        and self.rpn_head.get("type") == "GARPNHead")
        self._rpn = build_head(_dt(self.rpn_head) or dict(
            type="RPNHead", num_anchors=len(self.anchor_scales)
            * len(self.anchor_ratios), dtype=self.dtype))
        if self._ga_rpn:
            from ...core.points import build_pyramid_points
            pts, psizes, pstrides = build_pyramid_points(
                self.img_size, self.strides)
            self._ga_points = pts
            self._ga_pstrides = pstrides
            self._ga_level_sizes = psizes
        self._bbox_head = build_head(_dt(self.bbox_head) or dict(
            type="SharedFCBBoxHead", num_classes=16, dtype=self.dtype))
        self._shared_head = (build_shared_head(_dt(self.shared_head))
                             if self.shared_head else None)
        self._bbox_pool_size = self._bbox_head.roi_feat_size * (
            self._shared_head.stride if self._shared_head is not None
            else 1)
        self._rbbox_head = (build_head(_dt(self.rbbox_head))
                            if self.rbbox_head else None)
        if self.rbbox_refine_head:
            cfg = dict(_dt(self.rbbox_refine_head))
            cfg.setdefault("type", "RBBoxHead")
            cfg.setdefault("encode", "rtheta")
            if cfg["encode"] != "rtheta":
                raise ValueError(
                    "rbbox_refine_head regresses against rotated "
                    "proposals; encode must be 'rtheta'")
            self._rbbox_refine_head = build_head(cfg)
        else:
            self._rbbox_refine_head = None
        self._mask_head = (build_head(_dt(self.mask_head))
                           if self.mask_head else None)
        self._semantic_head = (build_head(_dt(self.semantic_head))
                               if self.semantic_head else None)
        self._mask_iou_head = (build_head(_dt(self.mask_iou_head))
                               if self.mask_iou_head else None)
        self._grid_head = (build_head(_dt(self.grid_head))
                           if self.grid_head else None)
        anchors, sizes = build_pyramid_anchors(
            self.img_size, self.strides,
            scales=self.anchor_scales, ratios=self.anchor_ratios)
        self._anchors = anchors
        self._level_sizes = sizes
        self._tc = _merge(DEFAULT_TRAIN_CFG, self.train_cfg)
        self._ec = _merge(DEFAULT_TEST_CFG, self.test_cfg)

        self._rpn_cls_loss = CrossEntropyLoss(use_sigmoid=True)
        self._rpn_bbox_loss = SmoothL1Loss(beta=1.0 / 9.0)
        if self._ga_rpn:
            from ..losses import FocalLoss
            self._ga_loc_loss = FocalLoss(gamma=2.0, alpha=0.25)
            self._ga_shape_loss = SmoothL1Loss(beta=0.2)
        self._rcnn_cls_loss = CrossEntropyLoss()
        self._rcnn_bbox_loss = SmoothL1Loss(beta=1.0)
        self._centermap_loss = CenterMapLoss()

    # ------------------------------------------------------------------
    def extract_feat(self, imgs):
        from ..preprocess import device_normalize
        imgs = device_normalize(imgs, self.img_norm, self.dtype)
        x = self._backbone(imgs)
        if isinstance(self._neck, (list, tuple)):
            for n in self._neck:   # stacked necks (e.g. FPN → BFP)
                x = n(x)
            return x
        return self._neck(x)

    def __call__(self, imgs):
        """Init/dummy path: touches every submodule so ``init`` creates
        all params (mirrors forward_dummy, two_stage.py:97-128)."""
        feats = self.extract_feat(imgs)
        rpn_all = self._rpn(feats)           # 2-tuple, or 4-tuple for GA
        rpn_cls, rpn_reg = rpn_all[0], rpn_all[-1]
        b = imgs.shape[0]
        dummy_rois = jnp.tile(
            jnp.asarray([[0.0, 0.0, 100.0, 100.0]], self.dtype), (4, 1))
        crops = multilevel_roi_align_fused(
            [f[0] for f in feats[:4]], dummy_rois,
            out_size=self._bbox_pool_size,
            featmap_strides=tuple(self.strides[:4]))
        if self._shared_head is not None:
            crops = self._shared_head(crops)
        cls_score, bbox_pred = self._bbox_head(crops)
        outs = (rpn_cls, rpn_reg, cls_score, bbox_pred)
        if self._semantic_head is not None:
            outs += self._semantic_head(feats)
        if self._rbbox_head is not None:
            outs += self._rbbox_head(crops)
        if self._rbbox_refine_head is not None:
            from ...ops.rroi_align import rroi_align_fused
            dummy_rrois = jnp.tile(jnp.asarray(
                [[50.0, 50.0, 20.0, 10.0, -0.5]], self.dtype), (4, 1))
            rcrops = rroi_align_fused(
                [f[0] for f in feats[:4]], dummy_rrois,
                out_size=self._rbbox_refine_head.roi_feat_size,
                featmap_strides=tuple(self.strides[:4]))
            outs += self._rbbox_refine_head(rcrops)
        if self._mask_head is not None:
            mcrops = multilevel_roi_align_fused(
                [f[0] for f in feats[:4]], dummy_rois, out_size=14,
                featmap_strides=tuple(self.strides[:4]))
            if self._shared_head is not None:
                # C4 models: mask head rides the res5 shared-head output
                # (mask_rcnn_r50_caffe_c4_1x.py — pool 14 → res5 → 7)
                mcrops = self._shared_head(mcrops)
            mp = self._mask_head(mcrops)
            outs += (mp,)
            if self._mask_iou_head is not None:
                outs += (self._mask_iou_head(
                    mcrops, jax.nn.sigmoid(mp[..., 0])),)
        if self._grid_head is not None:
            gcrops = multilevel_roi_align_fused(
                [f[0] for f in feats[:4]], dummy_rois,
                out_size=self.grid_roi_size,
                featmap_strides=tuple(self.strides[:4]))
            outs += (self._grid_head(gcrops),)
        return outs

    # ------------------------------------------------------------------
    def _rpn_outputs(self, feats, masked=False):
        """Flattened RPN predictions + anchor geometry.

        Returns (cls_flat, reg_flat, anchors, target_stds, level_sizes,
        loc_keep, ga_extras): for the plain RPN anchors are the static
        pyramid anchors and loc_keep/ga_extras are None; for GA-RPN
        (ga_rpn_head.py) anchors are the per-image guided anchors,
        loc_keep masks locations below the anchor-presence threshold
        and ga_extras = (shape_flat, loc_flat) feed the GA losses."""
        if not self._ga_rpn:
            rpn_cls, rpn_reg = self._rpn(feats)
            cls_flat, reg_flat = flatten_level_outputs(
                rpn_cls, rpn_reg, self._rpn.cls_out_channels)
            return (cls_flat, reg_flat, self._anchors, RPN_TARGET_STDS,
                    self._level_sizes, None, None)
        cls_out, shape_out, loc_out, reg_out = self._rpn(
            feats, masked=masked)
        b = cls_out[0].shape[0]
        f = lambda xs, d: jnp.concatenate(
            [x.reshape(b, -1, d) for x in xs], 1)
        cls_flat = f(cls_out, 1)
        shape_flat = f(shape_out, 2)
        loc_flat = f(loc_out, 1)[..., 0]
        reg_flat = f(reg_out, 4)
        base = self._ga_pstrides * 8.0
        w = base[None] * jnp.exp(shape_flat[..., 0])
        h = base[None] * jnp.exp(shape_flat[..., 1])
        cx = self._ga_points[None, :, 0]
        cy = self._ga_points[None, :, 1]
        anchors = jnp.stack(
            [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
        loc_keep = jax.nn.sigmoid(loc_flat) > self.ga_loc_filter_thr
        return (cls_flat, reg_flat, anchors,
                tuple(self.ga_target_stds), self._ga_level_sizes,
                loc_keep, (shape_flat, loc_flat))

    def _roi_features(self, feats, rois_b, out_size, infer=False):
        """Batched multi-level RoIAlign: feats are [B, H, W, C] lists,
        rois_b [B, R, 4] → [B, R, s, s, C].

        infer=True (predict paths, no grad needed) routes bf16
        features to the band-cached Pallas kernel — few large
        band DMAs instead of one DMA per roi (~2.4x faster)."""
        impl = self.roi_align_impl
        if impl == "auto":
            impl = ("pallas" if jax.default_backend()
                    in ("tpu", "axon") else "xla")
        if impl == "pallas":
            import os
            # default 'band'.  The round-4 KERNEL microbench favored
            # bandx (39.9 vs 59.6 ms @16k rois, chain_r4_s3e.log), but
            # the round-5 END-TO-END A/B reversed it: flagship bench
            # 134.25 p/s with band vs 131.69 with bandx (identical code
            # otherwise) — the microbench's uniform-roi layout
            # over-credits bandx's chunk grouping.  e2e wins; 'x' stays
            # available for re-evaluation, '0' = per-roi window kernel.
            band_impl = os.environ.get("AIDET_ROI_BAND", "1")
            if (infer and feats[0].dtype == jnp.bfloat16
                    and band_impl != "0"):
                if band_impl == "x":
                    from ...ops.roi_align_bandx import roi_align_bandx
                    return roi_align_bandx(
                        list(feats[:4]), rois_b, out_size,
                        tuple(self.strides[:4]))
                from ...ops.roi_align_band import roi_align_band
                return roi_align_band(
                    list(feats[:4]), rois_b, out_size,
                    tuple(self.strides[:4]))
            from ...ops.roi_align_pallas import roi_align_pallas
            return roi_align_pallas(
                list(feats[:4]), rois_b, out_size,
                tuple(self.strides[:4]))
        from ...ops.roi_align import batched_multilevel_roi_align
        return batched_multilevel_roi_align(
            list(feats[:4]), rois_b, out_size=out_size,
            featmap_strides=tuple(self.strides[:4]))

    def _apply_shared(self, crops):
        """res5 shared head over [B, R, s, s, C] roi crops (C4 models;
        parity: shared_heads/res_layer.py via two_stage.py bbox branch)."""
        if self._shared_head is None:
            return crops
        b, r = crops.shape[:2]
        out = self._shared_head(
            crops.reshape((b * r,) + crops.shape[2:]))
        return out.reshape((b, r) + out.shape[1:])

    def _fuse_semantic(self, crops, sem_feat, rois_b, out_size):
        """RoI-crop the semantic feature map and fuse into roi feats
        (parity: centermap_obb.py:161-177, 213-230)."""
        from ...ops.roi_align import roi_align
        stride = self.strides[self.semantic_level]

        def per_image(sf, rois):
            return roi_align(sf, rois, out_size, 1.0 / stride)
        sem = jax.vmap(per_image)(sem_feat, rois_b)
        if self.semantic_fusion == "mul":
            return crops * sem
        if self.semantic_fusion == "attention":
            return crops * jax.nn.sigmoid(sem)
        return crops + sem

    def loss(self, imgs, gt_boxes, gt_valid, gt_labels, img_shapes,
             gt_rboxes=None, gt_masks=None, gt_mask_weights=None,
             gt_semantic=None, gt_seg_weights=None):
        """Full training loss (parity: forward_train,
        two_stage.py:130-260 / rbbox_cnn.py:93-209).

        Args:
          imgs: [B, S, S, 3]; gt_boxes [B, G, 4]; gt_valid [B, G];
          gt_labels [B, G] (1-based); img_shapes [B, 2];
          gt_rboxes [B, G, D] (rotated branch);
          gt_masks [B, G, Hm, Wm] (mask branch — binary for BCE,
          soft centermaps for the CenterMap loss);
          gt_mask_weights [B, G, Hm, Wm] optional per-pixel weights.

        Mask-type targets may arrive uint8-quantized (pipeline
        device_normalize transfer path; /255 is also the reference's
        native centermap precision, loading.py:110-127).
        """
        def _dq(x):
            return (x.astype(jnp.float32) / 255.0
                    if x is not None and x.dtype == jnp.uint8 else x)
        gt_masks = _dq(gt_masks)
        gt_mask_weights = _dq(gt_mask_weights)
        gt_seg_weights = _dq(gt_seg_weights)
        tc = self._tc
        feats = self.extract_feat(imgs)
        (cls_flat, reg_flat, rpn_anchors, rpn_stds, rpn_lvl_sizes,
         loc_keep, ga_extras) = self._rpn_outputs(feats)

        key = self.make_rng("sampling")
        k_rpn, k_rcnn = jax.random.split(key)

        losses = {}
        rpn_cfg = dict(tc["rpn"])
        if self._ga_rpn:
            # GA-RPN (guided_anchor_head.py loss): location + shape
            # losses, then cls/reg on the (detached) guided anchors
            from ...core.anchors import anchor_target
            from ..heads.guided_anchor_head import ga_targets
            shape_flat, loc_flat = ga_extras
            loc_tgt, loc_w, shape_tgt, pos = jax.vmap(
                lambda g, v, l: ga_targets(
                    self._ga_points, self._ga_pstrides, g, v, l))(
                        gt_boxes, gt_valid, gt_labels)
            n_loc = jnp.maximum(loc_tgt.sum(), 1.0)
            losses["loss_rpn_loc"] = self._ga_loc_loss(
                loc_flat[..., None], loc_tgt.astype(jnp.int32),
                weight=loc_w[..., None], avg_factor=n_loc)
            losses["loss_rpn_shape"] = self._ga_shape_loss(
                shape_flat, shape_tgt,
                weight=jnp.broadcast_to(
                    pos[..., None], shape_flat.shape).astype(jnp.float32),
                avg_factor=jnp.maximum(pos.sum(), 1.0))

            anchors_sg = jax.lax.stop_gradient(rpn_anchors)

            def ga_single(cls_s, reg_s, anc, g, v, shp, k):
                tg = anchor_target(
                    anc, g[None], v[None], shp[None], k,
                    target_stds=rpn_stds,
                    pos_iou_thr=rpn_cfg["pos_iou_thr"],
                    neg_iou_thr=rpn_cfg["neg_iou_thr"],
                    min_pos_iou=rpn_cfg["min_pos_iou"],
                    num_samples=rpn_cfg["num_samples"],
                    pos_fraction=rpn_cfg["pos_fraction"],
                    neg_pos_ub=rpn_cfg["neg_pos_ub"],
                    pos_weight=rpn_cfg["pos_weight"],
                    sampling=True, allowed_border=-1)
                num = (tg.num_total_pos
                       + tg.num_total_neg).astype(jnp.float32)
                lc = self._rpn_cls_loss(cls_s, tg.labels[0],
                                        weight=tg.label_weights[0],
                                        avg_factor=num)
                lb = self._rpn_bbox_loss(reg_s, tg.bbox_targets[0],
                                         weight=tg.bbox_weights[0],
                                         avg_factor=num)
                return lc, lb

            keys_ga = jax.random.split(k_rpn, imgs.shape[0])
            lc, lb = jax.vmap(ga_single)(
                cls_flat, reg_flat, anchors_sg, gt_boxes, gt_valid,
                img_shapes, keys_ga)
            losses["loss_rpn_cls"] = lc.mean()
            losses["loss_rpn_bbox"] = lb.mean()
            cls_props = jnp.where(loc_keep[..., None], cls_flat, -1e4)
        else:
            rpn_losses = anchor_head_loss(
                cls_flat, reg_flat, rpn_anchors,
                gt_boxes, gt_valid, img_shapes, k_rpn,
                gt_labels=None,
                target_stds=rpn_stds,
                cls_loss=self._rpn_cls_loss,
                bbox_loss=self._rpn_bbox_loss,
                assigner_cfg=dict(
                    pos_iou_thr=rpn_cfg["pos_iou_thr"],
                    neg_iou_thr=rpn_cfg["neg_iou_thr"],
                    min_pos_iou=rpn_cfg["min_pos_iou"]),
                sampler_cfg=dict(
                    num_samples=rpn_cfg["num_samples"],
                    pos_fraction=rpn_cfg["pos_fraction"],
                    neg_pos_ub=rpn_cfg["neg_pos_ub"]),
                allowed_border=rpn_cfg["allowed_border"],
                pos_weight=rpn_cfg["pos_weight"],
                use_sigmoid_cls=True)
            losses["loss_rpn_cls"] = rpn_losses["loss_cls"]
            losses["loss_rpn_bbox"] = rpn_losses["loss_bbox"]
            cls_props = cls_flat

        # proposals (no grad through them, like the reference)
        props, prop_scores, prop_valid = rpn_proposals(
            jax.lax.stop_gradient(cls_props),
            jax.lax.stop_gradient(reg_flat),
            jax.lax.stop_gradient(rpn_anchors),
            rpn_lvl_sizes, img_shapes,
            target_stds=rpn_stds,
            **tc["rpn_proposal"])
        import os
        if os.environ.get("AIDET_DEBUG_PROP_LOSS"):
            # profiling probe (tools/bisect_train.py fwd_prop variant):
            # a loss key that depends on the proposals but nothing
            # after them, so XLA's DCE of the later loss subsets cuts
            # the program exactly at the proposal boundary
            losses["dbg_prop"] = (props.sum() + prop_scores.sum()) * 1e-12

        # stage 2: assign + sample per image (add gt as proposals,
        # base_sampler.py:69-76)
        rc = tc["rcnn"]
        cand = jnp.concatenate([gt_boxes, props], axis=1)
        cand_valid = jnp.concatenate([gt_valid, prop_valid], axis=1)
        b = imgs.shape[0]
        keys = jax.random.split(k_rcnn, b)

        use_ohem = rc.get("sampler", "random") == "ohem"
        if use_ohem:
            # OHEM (parity: samplers/ohem_sampler.py): rank candidates
            # by their classification loss under the current head —
            # requires a no-grad head pass over ALL candidates
            c_all = cand.shape[1]
            ohem_crops = self._apply_shared(self._roi_features(
                jax.tree.map(jax.lax.stop_gradient, feats), cand,
                self._bbox_pool_size))
            o_cls, _ = self._bbox_head(
                ohem_crops.reshape((b * c_all,)
                                   + ohem_crops.shape[2:]))
            o_cls = jax.lax.stop_gradient(
                o_cls.reshape(b, c_all, -1))
        else:
            o_cls = jnp.zeros(cand.shape[:2] + (1,))

        def sample_one(cand_i, cand_valid_i, gt_i, gtv_i, ocls_i, k):
            res = max_iou_assign(
                cand_i, gt_i, gtv_i, None,
                pos_iou_thr=rc["pos_iou_thr"],
                neg_iou_thr=rc["neg_iou_thr"],
                min_pos_iou=rc["min_pos_iou"],
                box_valid=cand_valid_i)
            if use_ohem:
                from ...core.sample import topk_mask_by_score
                # per-candidate CE loss against its assigned label
                logp = jax.nn.log_softmax(ocls_i, -1)
                lab = jnp.where(res.gt_inds > 0, res.labels, 0)
                ce = -jnp.take_along_axis(logp, lab[:, None], -1)[:, 0]
                num = rc["num_samples"]
                p_max = int(num * rc["pos_fraction"])
                pos = topk_mask_by_score(res.gt_inds > 0, ce, p_max)
                n_pos = pos.sum()
                neg = topk_mask_by_score(res.gt_inds == 0, ce,
                                         num - n_pos)
                n = cand_i.shape[0]
                big = jnp.float32(n)
                rank = jnp.where(pos, 0.0, jnp.where(neg, 1.0, 2.0)) \
                    * big + jnp.arange(n, dtype=jnp.float32)
                order = jnp.argsort(rank)[:num].astype(jnp.int32)
                from ...core.sample import FixedSample
                is_pos = pos[order]
                return FixedSample(order, is_pos, is_pos | neg[order],
                                   jnp.where(is_pos,
                                             res.gt_inds[order] - 1, -1))
            if rc.get("sampler", "random") == "combined":
                # Libra R-CNN recipe (CombinedSampler):
                # instance-balanced positives + IoU-balanced negatives
                from ...core.sample import sample_fixed_combined
                return sample_fixed_combined(
                    k, res.gt_inds, res.max_overlaps,
                    rc["num_samples"], rc["pos_fraction"],
                    rc["neg_pos_ub"], num_gts=gt_i.shape[0],
                    floor_thr=rc.get("floor_thr", -1.0),
                    floor_fraction=rc.get("floor_fraction", 0.0),
                    num_bins=rc.get("num_bins", 3))
            return sample_fixed(k, res.gt_inds, rc["num_samples"],
                                rc["pos_fraction"], rc["neg_pos_ub"])

        sample = jax.vmap(sample_one)(cand, cand_valid, gt_boxes,
                                      gt_valid, o_cls, keys)
        rois = jnp.take_along_axis(
            cand, sample.inds[..., None], axis=1)          # [B, R, 4]

        sem_feat = None
        if self._semantic_head is not None:
            seg_logits, sem_feat = self._semantic_head(feats)
            if gt_semantic is not None:
                from ..heads.semantic_head import semantic_loss
                sh = self._semantic_head
                losses["loss_seg"] = semantic_loss(
                    seg_logits, gt_semantic, gt_seg_weights,
                    loss_weight=getattr(sh, "loss_weight", 0.2),
                    use_focal=getattr(sh, "use_focal", False),
                    focal_gamma=getattr(sh, "focal_gamma", 2.0))

        crops = self._roi_features(
            feats, rois, self._bbox_pool_size)              # [B,R,s,s,C]
        if sem_feat is not None:
            crops = self._fuse_semantic(
                crops, sem_feat, rois, self._bbox_pool_size)
        crops = self._apply_shared(crops)
        r = rc["num_samples"]
        cls_score, bbox_pred = self._bbox_head(
            crops.reshape((b * r,) + crops.shape[2:]))

        tgt = jax.vmap(lambda s, ro, g, gl: bbox_target(
            s, ro, g, gl, RCNN_TARGET_MEANS, RCNN_TARGET_STDS,
            rc["pos_weight"]))(sample, rois, gt_boxes, gt_labels)
        flat_tgt = jax.tree.map(
            lambda x: x.reshape((b * r,) + x.shape[2:]), tgt)
        loss_cls, loss_bbox = bbox_head_loss(
            cls_score, bbox_pred, flat_tgt,
            self._rcnn_cls_loss, self._rcnn_bbox_loss,
            self._bbox_head.num_classes,
            self._bbox_head.reg_class_agnostic)
        losses["loss_cls"] = loss_cls
        losses["loss_bbox"] = loss_bbox

        # grid branch on jittered positive rois (grid_rcnn.py:58-81,
        # 176-196): whole-map sigmoid-BCE against gaussian grid-point
        # heatmaps, loss_weight 15 (configs/grid_rcnn)
        if self._grid_head is not None:
            from ..heads.grid_head import grid_target
            p_max = int(rc["num_samples"] * rc["pos_fraction"])
            pos_rois = rois[:, :p_max]
            pos_sample = jax.tree.map(lambda x: x[:, :p_max], sample)
            k_grid = jax.random.fold_in(key, 2)
            off = jax.random.uniform(k_grid, pos_rois.shape,
                                     minval=-0.15, maxval=0.15)
            cxcy = (pos_rois[..., 2:4] + pos_rois[..., :2]) / 2
            wh = jnp.abs(pos_rois[..., 2:4] - pos_rois[..., :2])
            new_c = cxcy + wh * off[..., :2]
            new_wh = wh * (1 + off[..., 2:])
            jit_rois = jnp.concatenate(
                [new_c - new_wh / 2, new_c + new_wh / 2], -1)
            hw = img_shapes[:, None, :]                    # [B, 1, 2]
            jit_rois = jnp.stack([
                jnp.clip(jit_rois[..., 0], 0, hw[..., 1] - 1),
                jnp.clip(jit_rois[..., 1], 0, hw[..., 0] - 1),
                jnp.clip(jit_rois[..., 2], 0, hw[..., 1] - 1),
                jnp.clip(jit_rois[..., 3], 0, hw[..., 0] - 1)], -1)
            gcrops = self._roi_features(feats, jit_rois,
                                        self.grid_roi_size)
            heat, heat_unfused = self._grid_head(
                gcrops.reshape((b * p_max,) + gcrops.shape[2:]),
                return_unfused=True)
            hm_size = 2 * self.grid_roi_size
            gtgt = jax.vmap(lambda s, ro, g: grid_target(
                s, ro, g, heatmap_size=hm_size,
                grid_points=self._grid_head.grid_points))(
                    pos_sample, jit_rois, gt_boxes)
            gtgt = gtgt.reshape(heat.shape)
            is_pos_g = pos_sample.is_pos.reshape(-1).astype(jnp.float32)
            navg = jnp.maximum(is_pos_g.sum(), 1.0) \
                * hm_size ** 2 * self._grid_head.grid_points

            def grid_bce(hm):
                bce = (jnp.maximum(hm, 0) - hm * gtgt
                       + jnp.log1p(jnp.exp(-jnp.abs(hm))))
                return (bce * is_pos_g[:, None, None, None]).sum() / navg
            # fused + unfused heatmaps both supervised and SUMMED
            # (grid_head.py:186-208: loss_fused + loss_unfused, each
            # at loss_weight 15)
            losses["loss_grid"] = 15.0 * (
                grid_bce(heat) + grid_bce(heat_unfused))

        # rotated branch (rbbox_cnn.py:192-209)
        if self._rbbox_head is not None:
            rcls, rreg = self._rbbox_head(
                crops.reshape((b * r,) + crops.shape[2:]))
            rtgt = jax.vmap(lambda s, ro, g, gl: rbbox_target(
                s, ro, g, gl, self.rbbox_encode,
                pos_weight=rc["pos_weight"]))(
                    sample, rois, gt_rboxes, gt_labels)
            flat_rtgt = jax.tree.map(
                lambda x: x.reshape((b * r,) + x.shape[2:]), rtgt)
            alt = None
            if self.hobb_robust_loss and self.rbbox_encode == "hobb":
                # sort-robust hobb: regression targets for all 4
                # first-edge representations of each gt (they decode
                # identically); the loss takes the per-sample min,
                # removing the best-point-sort cliff
                # (core/rboxes.py hobb_rolls)
                from ...core.rboxes import hobb_rolls
                g_rolled = hobb_rolls(gt_rboxes)        # [B, G, 4, 5]
                alt = jnp.stack([
                    jax.vmap(lambda s, ro, g, gl: rbbox_target(
                        s, ro, g, gl, "hobb",
                        pos_weight=rc["pos_weight"]))(
                        sample, rois, g_rolled[:, :, k], gt_labels)
                    .bbox_targets.reshape(b * r, -1)
                    for k in range(4)])                 # [4, N, 5]
            rloss_cls, rloss_bbox = bbox_head_loss(
                rcls, rreg, flat_rtgt,
                self._rcnn_cls_loss, self._rcnn_bbox_loss,
                self._rbbox_head.num_classes,
                self._rbbox_head.reg_class_agnostic,
                box_dim=self._rbbox_head.out_dim_reg,
                alt_bbox_targets=alt)
            losses["loss_rbbox_cls"] = rloss_cls
            losses["loss_rbbox"] = rloss_bbox

            # rotated-RoI refinement (BASELINE config #3): decode the
            # first-stage rboxes at the target labels, re-crop with
            # ROTATED RoIAlign, regress rtheta deltas against them
            if self._rbbox_refine_head is not None:
                from ...core.rboxes import (RBBOX_CODECS, delta2thetaobb,
                                            hobb2thetaobb,
                                            pointobb2thetaobb,
                                            rtheta2delta)
                from ...ops.rroi_align import batched_rroi_align

                p_max = int(rc["num_samples"] * rc["pos_fraction"])
                d1 = self._rbbox_head.out_dim_reg
                # class-selected first-stage decode on positive rois
                lbl = jax.vmap(lambda sm, gl: jnp.where(
                    sm.is_pos,
                    gl[jnp.clip(sm.gt_inds, 0, gl.shape[0] - 1)], 0))(
                        sample, gt_labels)                  # [B, R]
                rreg_b = rreg.reshape(b, r, -1)
                if not self._rbbox_head.reg_class_agnostic:
                    grp = rreg_b.reshape(b, r, -1, d1)
                    rreg_sel = jnp.take_along_axis(
                        grp, jnp.clip(lbl, 0, grp.shape[2] - 1)
                        [..., None, None], axis=2)[:, :, 0]
                else:
                    rreg_sel = rreg_b
                _, _, decode1, _ = RBBOX_CODECS[self.rbbox_encode]
                dec = jax.vmap(decode1)(rois, rreg_sel)     # [B, R, D]
                if self.rbbox_encode == "pointobb":
                    dec = pointobb2thetaobb(dec)
                elif self.rbbox_encode == "hobb":
                    dec = hobb2thetaobb(dec)
                stage1 = jax.lax.stop_gradient(dec[:, :p_max])
                # keep geometry sane for the rroi crop
                stage1 = jnp.concatenate(
                    [stage1[..., :2],
                     jnp.clip(stage1[..., 2:4], 2.0, self.img_size),
                     stage1[..., 4:]], -1)
                rcrops = batched_rroi_align(
                    [f.astype(self.dtype) for f in feats[:4]], stage1,
                    out_size=self._rbbox_refine_head.roi_feat_size,
                    featmap_strides=tuple(self.strides[:4]))
                d2 = self._rbbox_refine_head.out_dim_reg
                ref_cls, ref_reg = self._rbbox_refine_head(
                    rcrops.reshape((b * p_max,) + rcrops.shape[2:]))
                pos_sm = jax.tree.map(lambda x: x[:, :p_max], sample)
                gtm = jax.vmap(lambda sm, g: g[jnp.clip(
                    sm.gt_inds, 0, g.shape[0] - 1)])(pos_sm, gt_rboxes)
                # gt_rboxes are stored in the config's rbbox_encode
                # format — convert to thetaobb like `dec` above, since
                # rtheta2delta reads (cx, cy, w, h, theta)
                if self.rbbox_encode == "pointobb":
                    gtm = pointobb2thetaobb(gtm)
                elif self.rbbox_encode == "hobb":
                    gtm = hobb2thetaobb(gtm)
                tgt_ref = jax.vmap(rtheta2delta)(stage1, gtm)
                is_pos = pos_sm.is_pos.reshape(-1).astype(jnp.float32)
                lbl_pos = lbl[:, :p_max].reshape(-1)
                npos = jnp.maximum(is_pos.sum(), 1.0)
                if not self._rbbox_refine_head.reg_class_agnostic:
                    grp2 = ref_reg.reshape(b * p_max, -1, d2)
                    ref_sel = jnp.take_along_axis(
                        grp2, jnp.clip(lbl_pos, 0, grp2.shape[1] - 1)
                        [:, None, None], axis=1)[:, 0]
                else:
                    ref_sel = ref_reg
                diff = ref_sel - tgt_ref.reshape(b * p_max, d2)
                beta = 1.0
                sl1 = jnp.where(jnp.abs(diff) < beta,
                                0.5 * diff * diff / beta,
                                jnp.abs(diff) - 0.5 * beta)
                losses["loss_rbbox_refine"] = (
                    sl1.sum(-1) * is_pos).sum() / npos
                ce = -jax.nn.log_softmax(ref_cls)[
                    jnp.arange(b * p_max), lbl_pos]
                lw = pos_sm.valid.reshape(-1).astype(jnp.float32)
                losses["loss_rbbox_refine_cls"] = (
                    (ce * lw).sum() / jnp.maximum(lw.sum(), 1.0))

        # mask branch on positive rois (two_stage.py:225-259)
        if self._mask_head is not None:
            p_max = int(rc["num_samples"] * rc["pos_fraction"])
            pos_rois = rois[:, :p_max]                      # positives first
            pos_sample = jax.tree.map(lambda x: x[:, :p_max], sample)
            mcrops = self._roi_features(feats, pos_rois, 14)
            if sem_feat is not None:
                mcrops = self._fuse_semantic(mcrops, sem_feat,
                                             pos_rois, 14)
            mcrops = self._apply_shared(mcrops)
            mask_pred = self._mask_head(
                mcrops.reshape((b * p_max,) + mcrops.shape[2:]))
            # target size must equal the head's output resolution
            # (roi 14 × upsample, 28 in the reference FPN configs;
            # with a C4 shared head the crop shrinks to 7 first, so
            # read the size off the actual prediction)
            msize = mask_pred.shape[1]
            # gt_masks may be rasterised below image resolution; scale
            # rois into mask coordinates before cropping
            mscale = gt_masks.shape[-1] / self.img_size
            mtgt = jax.vmap(lambda s, ro, m: mask_target(
                s, ro * mscale, m, msize))(
                    pos_sample, pos_rois, gt_masks)
            mtgt = mtgt.reshape((b * p_max,) + mtgt.shape[2:])
            pos_labels = jax.vmap(
                lambda s, gl: jnp.where(
                    s.is_pos, gl[jnp.clip(s.gt_inds, 0, gl.shape[0] - 1)],
                    0))(pos_sample, gt_labels).reshape(-1)
            is_pos = pos_sample.is_pos.reshape(-1)
            navg = jnp.maximum(is_pos.sum(), 1.0) * msize ** 2
            if self.mask_loss_type == "centermap":
                if gt_mask_weights is not None:
                    # crop weights with the SAME geometry (mask-space
                    # rois) and size as the centermap target so each
                    # weight pixel aligns with its target pixel;
                    # the reference enters them as w/255 + 1 ∈ [1, 2]
                    # (centermap_head.py:21-22) — pipeline provides
                    # w in [0, 1]
                    mw = jax.vmap(lambda s, ro, m: mask_target(
                        s, ro * mscale, m, msize))(
                            pos_sample, pos_rois, gt_mask_weights)
                    mw = mw.reshape(mtgt.shape) + 1.0
                else:
                    mw = None
                losses["loss_mask"] = self._centermap_loss(
                    mask_pred, mtgt, pos_labels, mask_weight=mw,
                    roi_weight=is_pos.astype(jnp.float32),
                    avg_factor=navg)
            else:
                losses["loss_mask"] = mask_cross_entropy(
                    mask_pred, mtgt, pos_labels,
                    weight=is_pos[:, None, None].astype(jnp.float32),
                    avg_factor=navg)

            if self._mask_iou_head is not None:
                # Mask Scoring R-CNN (maskiou_head.py): regress the IoU
                # between the predicted (class-sliced, sigmoided) mask
                # and the target mask
                c = mask_pred.shape[-1]
                idx = jnp.clip(pos_labels.astype(jnp.int32) - 1, 0, c - 1)
                pred_c = jax.nn.sigmoid(jnp.take_along_axis(
                    mask_pred, idx[:, None, None, None], axis=-1)[..., 0])
                pred_bin = pred_c > 0.5
                tgt_bin = mtgt > 0.5
                inter = (pred_bin & tgt_bin).sum(axis=(1, 2))
                union = jnp.maximum((pred_bin | tgt_bin).sum(axis=(1, 2)),
                                    1)
                iou_tgt = inter / union
                flat_feats = mcrops.reshape(
                    (b * p_max,) + mcrops.shape[2:])
                iou_pred = self._mask_iou_head(
                    flat_feats, jax.lax.stop_gradient(pred_c))
                iou_pred_c = jnp.take_along_axis(
                    iou_pred, idx[:, None], axis=-1)[:, 0]
                diff = (iou_pred_c - iou_tgt) * is_pos
                losses["loss_mask_iou"] = 0.5 * (diff ** 2).sum() \
                    / jnp.maximum(is_pos.sum(), 1.0)
        return losses

    # ------------------------------------------------------------------
    def predict_from_proposals(self, imgs, proposals, prop_valid,
                               img_shapes, scale_factors=None):
        """Fast R-CNN path: detection from precomputed proposals
        (parity: mmdet/models/detectors/fast_rcnn.py)."""
        ec = self._ec
        feats = self.extract_feat(imgs)
        b, p = proposals.shape[:2]
        crops = self._apply_shared(self._roi_features(
            feats, proposals, self._bbox_pool_size, infer=True))
        cls_score, bbox_pred = self._bbox_head(
            crops.reshape((b * p,) + crops.shape[2:]))
        cls_score = cls_score.reshape(b, p, -1)
        bbox_pred = bbox_pred.reshape(b, p, -1)
        rc = ec["rcnn"]

        def decode_one(rois_i, cls_i, pred_i, shape_i, valid_i):
            boxes, scores = bbox_head_decode(
                rois_i, cls_i, pred_i, RCNN_TARGET_MEANS,
                RCNN_TARGET_STDS, img_shape=shape_i,
                reg_class_agnostic=self._bbox_head.reg_class_agnostic)
            return multiclass_nms(boxes, scores, rc["score_thr"],
                                  max_num=rc["max_per_img"],
                                  valid=valid_i, **nms_cfg_kwargs(rc))
        dets = jax.vmap(decode_one)(proposals, cls_score, bbox_pred,
                                    img_shapes, prop_valid)
        boxes = dets.boxes
        if scale_factors is not None:
            boxes = boxes / scale_factors[:, None, None]
        return dict(boxes=boxes, scores=dets.scores, labels=dets.labels,
                    valid=dets.valid)

    def aug_predict(self, imgs, img_shapes, flips, scale_factors):
        """Multi-augmentation (scale × flip) test for ONE image.

        Parity: TwoStageDetector.aug_test (two_stage.py:319-353) with
        merge_aug_proposals / merge_aug_bboxes
        (core/post_processing/merge_augs.py): proposals from every aug
        are mapped back and fused with NMS; the bbox head then scores
        the SAME merged proposals under each aug, and the mapped-back
        boxes and scores are averaged before one final NMS.

        Args:
          imgs: [A, S, S, 3] the augmented variants;
          img_shapes: [A, 2]; flips: [A] bool; scale_factors: [A].
        Returns the same dict as :meth:`predict` (leading dim 1).
        """
        ec = self._ec
        feats = self.extract_feat(imgs)
        (cls_flat, reg_flat, rpn_anchors, rpn_stds, rpn_lvl_sizes,
         loc_keep, _) = self._rpn_outputs(feats, masked=True)
        if loc_keep is not None:
            cls_flat = jnp.where(loc_keep[..., None], cls_flat, -1e4)
        props, scores, valid = rpn_proposals(
            cls_flat, reg_flat, rpn_anchors, rpn_lvl_sizes,
            img_shapes, target_stds=rpn_stds, **ec["rpn"])
        a, p = props.shape[:2]

        # flips mirror about the aug's ACTUAL content width (the
        # keep-ratio resize leaves content in [0, w_actual) of the
        # padded canvas; bbox_mapping_back uses img_shape, not
        # pad_shape) — mirroring about the canvas width would shift
        # every flipped-aug box by (canvas - w_actual)
        def unmap(boxes, flip, sf, w_img):
            x1 = jnp.where(flip, w_img - boxes[..., 2] - 1, boxes[..., 0])
            x2 = jnp.where(flip, w_img - boxes[..., 0] - 1, boxes[..., 2])
            out = jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], -1)
            return out / sf

        def remap(boxes, flip, sf, w_img):
            b = boxes * sf
            x1 = jnp.where(flip, w_img - b[..., 2] - 1, b[..., 0])
            x2 = jnp.where(flip, w_img - b[..., 0] - 1, b[..., 2])
            return jnp.stack([x1, b[..., 1], x2, b[..., 3]], -1)

        # merge proposals in the original frame (merge_aug_proposals)
        props_orig = jax.vmap(unmap)(props, flips, scale_factors,
                                     img_shapes[:, 1])
        flat_p = props_orig.reshape(a * p, 4)
        flat_s = scores.reshape(a * p)
        flat_v = valid.reshape(a * p)
        keep = nms(flat_p, flat_s, ec["rpn"]["nms_thr"], flat_v)
        kept_s = jnp.where(keep, flat_s, NEG_INF)
        k = min(ec["rpn"]["max_num"], flat_s.shape[0])
        top_s, top_i = jax.lax.top_k(kept_s, k)
        merged = flat_p[top_i]
        merged_valid = top_s > NEG_INF / 2

        # score the merged proposals under every aug
        props_aug = jax.vmap(lambda f, s, w: remap(merged, f, s, w))(
            flips, scale_factors, img_shapes[:, 1])     # [A, K, 4]
        crops = self._apply_shared(self._roi_features(
            feats, props_aug, self._bbox_pool_size, infer=True))
        cls_score, bbox_pred = self._bbox_head(
            crops.reshape((a * k,) + crops.shape[2:]))
        cls_score = cls_score.reshape(a, k, -1)
        bbox_pred = bbox_pred.reshape(a, k, -1)

        def decode_unmap(rois_i, pred_i, shape_i, flip, sf):
            boxes = delta2bbox(rois_i, pred_i, RCNN_TARGET_MEANS,
                               RCNN_TARGET_STDS, max_shape=shape_i)
            n_grp = boxes.shape[-1] // 4
            g = boxes.reshape(k, n_grp, 4)
            return jax.vmap(lambda bb: unmap(bb, flip, sf, shape_i[1]),
                            in_axes=1, out_axes=1)(g).reshape(k, -1)

        boxes_all = jax.vmap(decode_unmap)(props_aug, bbox_pred,
                                           img_shapes, flips,
                                           scale_factors)
        avg_boxes = boxes_all.mean(0)
        avg_scores = jax.nn.softmax(cls_score, -1).mean(0)

        rc = ec["rcnn"]
        from ...ops.nms import NMSResult
        res = multiclass_nms(avg_boxes, avg_scores, rc["score_thr"],
                             max_num=rc["max_per_img"],
                             valid=merged_valid, **nms_cfg_kwargs(rc))
        return dict(boxes=res.boxes[None], scores=res.scores[None],
                    labels=res.labels[None], valid=res.valid[None])

    def predict(self, imgs, img_shapes, scale_factors=None):
        """Batched inference (parity: simple_test, two_stage.py:295-317
        + the rotated parallel path rbbox_cnn.py:214-243).

        Returns a dict of fixed-size padded results per image.
        """
        ec = self._ec
        feats = self.extract_feat(imgs)
        (cls_flat, reg_flat, rpn_anchors, rpn_stds, rpn_lvl_sizes,
         loc_keep, _) = self._rpn_outputs(feats, masked=True)
        if loc_keep is not None:
            cls_flat = jnp.where(loc_keep[..., None], cls_flat, -1e4)
        props, _, prop_valid = rpn_proposals(
            cls_flat, reg_flat, rpn_anchors, rpn_lvl_sizes,
            img_shapes, target_stds=rpn_stds, **ec["rpn"])

        b, p = props.shape[:2]
        sem_feat = None
        if self._semantic_head is not None:
            _, sem_feat = self._semantic_head(feats)
        crops = self._roi_features(
            feats, props, self._bbox_pool_size, infer=True)
        if sem_feat is not None:
            crops = self._fuse_semantic(
                crops, sem_feat, props, self._bbox_pool_size)
        crops = self._apply_shared(crops)
        cls_score, bbox_pred = self._bbox_head(
            crops.reshape((b * p,) + crops.shape[2:]))
        cls_score = cls_score.reshape(b, p, -1)
        bbox_pred = bbox_pred.reshape(b, p, -1)

        rc = ec["rcnn"]

        def decode_one(rois_i, cls_i, pred_i, shape_i, valid_i):
            boxes, scores = bbox_head_decode(
                rois_i, cls_i, pred_i, RCNN_TARGET_MEANS, RCNN_TARGET_STDS,
                img_shape=shape_i,
                reg_class_agnostic=self._bbox_head.reg_class_agnostic)
            return multiclass_nms(boxes, scores, rc["score_thr"],
                                  max_num=rc["max_per_img"],
                                  valid=valid_i, **nms_cfg_kwargs(rc))
        dets = jax.vmap(decode_one)(props, cls_score, bbox_pred,
                                    img_shapes, prop_valid)
        out = dict(boxes=dets.boxes, scores=dets.scores,
                   labels=dets.labels, valid=dets.valid)

        # grid refinement replaces the regressed boxes with the ones
        # recovered from the grid heatmaps (grid_rcnn.py:198-226)
        if self._grid_head is not None:
            from ..heads.grid_head import grid_to_boxes
            det_rois = dets.boxes[..., :4]
            gcrops = self._roi_features(feats, det_rois,
                                        self.grid_roi_size, infer=True)
            k = det_rois.shape[1]
            heat = self._grid_head(
                gcrops.reshape((b * k,) + gcrops.shape[2:]))
            heat = heat.reshape((b, k) + heat.shape[1:])
            refined = jax.vmap(grid_to_boxes)(heat, det_rois)
            hw = img_shapes[:, None, :]
            refined = jnp.stack([
                jnp.clip(refined[..., 0], 0, hw[..., 1] - 1),
                jnp.clip(refined[..., 1], 0, hw[..., 0] - 1),
                jnp.clip(refined[..., 2], 0, hw[..., 1] - 1),
                jnp.clip(refined[..., 3], 0, hw[..., 0] - 1)], -1)
            out["boxes"] = jnp.where(dets.valid[..., None], refined,
                                     out["boxes"])

        if self._rbbox_head is not None:
            # the parallel rbbox decode only ever reads the rows the
            # HBB NMS kept (select_parallel_rboxes gathers at roi_idx,
            # rbbox_nms.py:64-118) — run the rbbox head on just those
            # K=max_per_img crops instead of all P proposals (identical
            # outputs, ~P/K x less head work at inference)
            k = dets.boxes.shape[1]
            roi = jnp.clip(dets.roi_idx, 0, p - 1)            # [B, K]
            kcrops = jnp.take_along_axis(
                crops, roi[..., None, None, None], axis=1)
            rcls, rreg = self._rbbox_head(
                kcrops.reshape((b * k,) + kcrops.shape[2:]))
            rreg = rreg.reshape(b, k, -1)
            kprops = jnp.take_along_axis(props, roi[..., None], axis=1)
            local_idx = jnp.arange(k)

            def rb_one(rois_i, rreg_i, det_i):
                rboxes, _ = rbbox_head_decode(
                    rois_i, jnp.zeros((k, 1)), rreg_i, self.rbbox_encode)
                det_loc = det_i._replace(
                    roi_idx=local_idx.astype(det_i.roi_idx.dtype))
                return select_parallel_rboxes(
                    rboxes, det_loc, self._rbbox_head.out_dim_reg)
            out["rboxes"] = jax.vmap(rb_one)(kprops, rreg, dets)

            # rotated-RoI refinement at inference: re-crop the selected
            # rboxes with rotated RoIAlign and apply the rtheta deltas
            if self._rbbox_refine_head is not None:
                from ...core.rboxes import (delta2rtheta, hobb2thetaobb,
                                            pointobb2thetaobb)
                from ...ops.rroi_align import batched_rroi_align

                rb = out["rboxes"]
                if self.rbbox_encode == "pointobb":
                    rb = pointobb2thetaobb(rb)
                elif self.rbbox_encode == "hobb":
                    rb = hobb2thetaobb(rb)
                rb = jnp.concatenate(
                    [rb[..., :2],
                     jnp.clip(rb[..., 2:4], 2.0, self.img_size),
                     rb[..., 4:]], -1)
                k = rb.shape[1]
                rcrops = batched_rroi_align(
                    [f.astype(self.dtype) for f in feats[:4]], rb,
                    out_size=self._rbbox_refine_head.roi_feat_size,
                    featmap_strides=tuple(self.strides[:4]))
                d2 = self._rbbox_refine_head.out_dim_reg
                _, ref_reg = self._rbbox_refine_head(
                    rcrops.reshape((b * k,) + rcrops.shape[2:]))
                if not self._rbbox_refine_head.reg_class_agnostic:
                    grp = ref_reg.reshape(b, k, -1, d2)
                    cls_idx = jnp.clip(dets.labels + 1, 0,
                                       grp.shape[2] - 1)
                    ref_sel = jnp.take_along_axis(
                        grp, cls_idx[..., None, None], axis=2)[..., 0, :]
                else:
                    ref_sel = ref_reg.reshape(b, k, d2)
                refined = jax.vmap(delta2rtheta)(rb, ref_sel)
                out["rboxes"] = jnp.where(dets.valid[..., None],
                                          refined, 0.0)

        if self._mask_head is not None:
            def gather_det_rois(det_i):
                return det_i.boxes[:, :4]
            det_rois = jax.vmap(gather_det_rois)(dets)
            mcrops = self._roi_features(feats, det_rois, 14, infer=True)
            if sem_feat is not None:
                mcrops = self._fuse_semantic(mcrops, sem_feat,
                                             det_rois, 14)
            mcrops = self._apply_shared(mcrops)
            k = det_rois.shape[1]
            mask_pred = self._mask_head(
                mcrops.reshape((b * k,) + mcrops.shape[2:]))
            c = mask_pred.shape[-1]
            lbl = jnp.clip(dets.labels.reshape(-1), 0, c - 1)
            mask_sel = jnp.take_along_axis(
                mask_pred, lbl[:, None, None, None], axis=-1)[..., 0]
            s = mask_sel.shape[-1]
            if self.mask_loss_type == "centermap":
                probs = mask_sel  # raw map (centermap_head.py:34-47)
            else:
                probs = jax.nn.sigmoid(mask_sel)
            out["masks"] = probs.reshape(b, k, s, s)
            if self._mask_iou_head is not None:
                # rescale detection scores by the predicted mask IoU
                # (mask_scoring_rcnn.py semantics)
                flat_feats = mcrops.reshape(
                    (b * k,) + mcrops.shape[2:])
                iou_pred = self._mask_iou_head(
                    flat_feats, jax.nn.sigmoid(mask_sel))
                iou_c = jnp.take_along_axis(
                    iou_pred, lbl[:, None], axis=-1)[:, 0]
                out["mask_scores"] = (out["scores"]
                                      * jnp.clip(iou_c.reshape(b, k),
                                                 0.0, 1.0))
        if scale_factors is not None:
            sf = scale_factors.reshape(b, 1, 1)
            out["boxes"] = out["boxes"] / sf
            if "rboxes" in out:
                d = out["rboxes"].shape[-1]
                # refined outputs are always thetaobb (theta unscaled)
                if d == 5 and (self.rbbox_encode == "thetaobb"
                               or self._rbbox_refine_head is not None):
                    scale = jnp.concatenate(
                        [jnp.ones((b, 1, 4)) / sf[..., None][..., 0],
                         jnp.ones((b, 1, 1))], -1)
                    out["rboxes"] = out["rboxes"] * scale
                else:
                    out["rboxes"] = out["rboxes"] / sf
        return out


def _two_stage_factory(name, **preset):
    @DETECTORS.register(name=name)
    def factory(**kwargs):
        merged = dict(preset)
        merged.update(kwargs)
        return TwoStageDetector(**merged)
    factory.__name__ = name
    return factory


FasterRCNN = _two_stage_factory("FasterRCNN")
# Fast R-CNN: same module; use predict_from_proposals at test time
# (mmdet/models/detectors/fast_rcnn.py)
FastRCNN = _two_stage_factory("FastRCNN")
MaskRCNN = _two_stage_factory(
    "MaskRCNN", mask_head=dict(type="FCNMaskHead"))
MaskScoringRCNN = _two_stage_factory(
    "MaskScoringRCNN", mask_head=dict(type="FCNMaskHead"),
    mask_iou_head=dict(type="MaskIoUHead"))
RBBoxRCNN = _two_stage_factory(
    "RBBoxRCNN", rbbox_head=dict(type="RBBoxHead"))
# RBBoxRCNN + rotated-RoI refinement stage (BASELINE config #3:
# "faster_rcnn + rotated RoI align with H/Point OBB heads"): the
# first-stage rbbox head may use any encoding; its decoded rboxes are
# re-cropped with rotated RoIAlign and refined by an rtheta head
RBBoxRCNNRRoI = _two_stage_factory(
    "RBBoxRCNNRRoI", rbbox_head=dict(type="RBBoxHead"),
    rbbox_refine_head=dict(type="RBBoxHead", encode="rtheta"))
MaskOBB = _two_stage_factory(
    "MaskOBB", mask_head=dict(type="FCNMaskHead"))
CenterMapOBB = _two_stage_factory(
    "CenterMapOBB", mask_head=dict(type="CenterMapHead"),
    mask_loss_type="centermap")
# CenterMap-Net: CenterMapOBB + WPSGA semantic branch fused into the
# RoI features (configs/dota/centermap_net_tgrs_mask_weight_V4.py)
CenterMapNet = _two_stage_factory(
    "CenterMapNet", mask_head=dict(type="CenterMapHead"),
    mask_loss_type="centermap",
    semantic_head=dict(type="WPSGAHead", channels=256),
    semantic_fusion="add")
# GA-Faster R-CNN: guided-anchoring RPN feeding the standard second
# stage (reference configs/guided_anchoring/ga_faster_*.py)
GAFasterRCNN = _two_stage_factory(
    "GAFasterRCNN", rpn_head=dict(type="GARPNHead"))
# Grid R-CNN: regression replaced by grid-point heatmap localisation
# (mmdet/models/detectors/grid_rcnn.py)
GridRCNN = _two_stage_factory(
    "GridRCNN", grid_head=dict(type="GridHead"))
# Double-Head R-CNN: conv branch for regression, fc branch for cls
# (mmdet/models/detectors/double_head_rcnn.py) — a bbox-head swap here
DoubleHeadRCNN = _two_stage_factory(
    "DoubleHeadRCNN", bbox_head=dict(type="DoubleConvFCBBoxHead"))
