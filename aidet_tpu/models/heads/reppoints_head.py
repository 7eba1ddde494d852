"""RepPoints head + detector (parity: mmdet/models/anchor_heads/
reppoints_head.py + detectors/reppoints_detector.py): each location
predicts a set of points via two stages (init offsets, then a
deformable-conv refinement conditioned on them); boxes derive from the
point set by the min-max transform."""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.assign import max_iou_assign
from ...core.points import build_pyramid_points
from ...ops.deform_conv import deform_conv2d
from ...ops.nms import multiclass_nms
from ..builder import build_backbone, build_head, build_neck
from ..losses import FocalLoss, SmoothL1Loss
from ..registry import DETECTORS, HEADS


def points2bbox_minmax(pts):
    """[..., 2*N] point offsets → [..., 4] boxes (min-max transform,
    reppoints_head.py points2bbox)."""
    xs = pts[..., 0::2]
    ys = pts[..., 1::2]
    return jnp.stack([xs.min(-1), ys.min(-1), xs.max(-1), ys.max(-1)],
                     axis=-1)


def points2bbox_moment(x, y, moment_transfer, moment_mul):
    """Moment transform (reppoints_head.py points2bbox,
    transform_method='moment'): box = point mean ± std·exp(transfer),
    where `transfer` is a learned 2-vector that receives only
    `moment_mul` of the gradient.

    x, y: [..., N] point coordinates (same frame as the output box).
    """
    mt = (moment_transfer * moment_mul
          + jax.lax.stop_gradient(moment_transfer) * (1 - moment_mul))
    x_mean = x.mean(-1)
    y_mean = y.mean(-1)
    # torch.std default is the unbiased estimator (ddof=1)
    x_std = jnp.sqrt(jnp.maximum(
        ((x - x_mean[..., None]) ** 2).sum(-1) / (x.shape[-1] - 1), 1e-12))
    y_std = jnp.sqrt(jnp.maximum(
        ((y - y_mean[..., None]) ** 2).sum(-1) / (y.shape[-1] - 1), 1e-12))
    half_w = x_std * jnp.exp(mt[0])
    half_h = y_std * jnp.exp(mt[1])
    return jnp.stack([x_mean - half_w, y_mean - half_h,
                      x_mean + half_w, y_mean + half_h], axis=-1)


@HEADS.register
class RepPointsHead(nn.Module):
    num_classes: int = 16
    in_channels: int = 256
    feat_channels: int = 256
    point_feat_channels: int = 256
    stacked_convs: int = 3
    num_points: int = 9
    gradient_mul: float = 0.1
    prior_prob: float = 0.01
    # reference RepPointsHead towers carry GN(32) by default
    # (configs/reppoints/*, norm_cfg=dict(type='GN', num_groups=32));
    # reppoints_moment_r50_no_gn_fpn_1x.py sets norm_cfg=None
    norm_cfg: Any = None
    dtype: jnp.dtype = jnp.float32

    @property
    def cls_out_channels(self):
        return self.num_classes - 1

    def _norms(self, prefix):
        if not (self.norm_cfg and self.norm_cfg.get("type") == "GN"):
            return [lambda v: v] * self.stacked_convs
        return [nn.GroupNorm(num_groups=self.norm_cfg.get(
                    "num_groups", 32), dtype=self.dtype,
                    name=f"{prefix}_gn{i}")
                for i in range(self.stacked_convs)]

    @nn.compact
    def __call__(self, feats):
        n_off = 2 * self.num_points
        cls_tower = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             use_bias=self.norm_cfg is None,
                             dtype=self.dtype, name=f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        reg_tower = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             use_bias=self.norm_cfg is None,
                             dtype=self.dtype, name=f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        cls_norms = self._norms("cls")
        reg_norms = self._norms("reg")
        init_conv = nn.Conv(self.point_feat_channels, (3, 3), padding=1,
                            dtype=self.dtype, name="pts_init_conv")
        init_out = nn.Conv(n_off, (1, 1), dtype=self.dtype,
                           name="pts_init_out")
        bias_init = nn.initializers.constant(
            -math.log((1 - self.prior_prob) / self.prior_prob))
        cls_dweight = self.param(
            "cls_dconv_kernel", nn.initializers.he_normal(),
            (3, 3, self.feat_channels, self.point_feat_channels))
        cls_out_conv = nn.Conv(self.cls_out_channels, (1, 1),
                               bias_init=bias_init, dtype=self.dtype,
                               name="cls_out")
        refine_dweight = self.param(
            "refine_dconv_kernel", nn.initializers.he_normal(),
            (3, 3, self.feat_channels, self.point_feat_channels))
        refine_out = nn.Conv(n_off, (1, 1), dtype=self.dtype,
                             name="pts_refine_out")

        # map the 9 predicted points onto 3x3 deform-conv tap offsets
        # (reppoints_head.py offsets: points relative to the regular grid)
        base = jnp.asarray(
            [[dy, dx] for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
            self.dtype).reshape(-1)

        cls_scores, init_pts, refine_pts = [], [], []
        for f in feats:
            c = r = f
            for cc, cn, rr, rn in zip(cls_tower, cls_norms,
                                      reg_tower, reg_norms):
                c = nn.relu(cn(cc(c)))
                r = nn.relu(rn(rr(r)))
            o1 = init_out(nn.relu(init_conv(r)))      # [B,H,W,2N]
            init_pts.append(o1)

            grad_mul = (self.gradient_mul * o1
                        + (1 - self.gradient_mul)
                        * jax.lax.stop_gradient(o1))
            # deform-conv offsets = predicted points − regular grid;
            # predicted points are (dy, dx) pairs already
            dcn_off = grad_mul - base

            def dcn(x, off, wkey):
                return jax.vmap(
                    lambda img, o: deform_conv2d(img, o, wkey))(x, off)
            c_feat = nn.relu(dcn(c, dcn_off, cls_dweight))
            cls_scores.append(cls_out_conv(c_feat))
            r_feat = nn.relu(dcn(r, dcn_off, refine_dweight))
            o2 = refine_out(r_feat) + jax.lax.stop_gradient(o1)
            refine_pts.append(o2)
        return cls_scores, init_pts, refine_pts


@DETECTORS.register
class RepPointsDetector(nn.Module):
    backbone: Any = None
    neck: Any = None
    bbox_head: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    img_size: int = 1024
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    point_base_scale: int = 4
    # points → box transform (reppoints_head.py points2bbox):
    # 'minmax' | 'partial_minmax' (first 4 points) | 'moment'
    # (mean ± std·exp(learned transfer), the headline RepPoints method)
    transform_method: str = "minmax"
    moment_mul: float = 0.01
    dtype: Any = jnp.float32

    def setup(self):
        if self.transform_method == "moment":
            self._moment_transfer = self.param(
                "moment_transfer", nn.initializers.zeros, (2,))
        self._backbone = build_backbone(self.backbone or dict(
            type="ResNet", depth=50, dtype=self.dtype))
        self._neck = build_neck(self.neck or dict(
            type="FPN", num_outs=5, start_level=1, add_extra_convs=True,
            extra_convs_on_inputs=False, dtype=self.dtype))
        self._head = build_head(self.bbox_head or dict(
            type="RepPointsHead", num_classes=16, dtype=self.dtype))
        pts, sizes, pstrides = build_pyramid_points(
            self.img_size, self.strides)
        self._points = pts
        self._level_sizes = sizes
        self._pstrides = pstrides
        ec = dict(nms_pre=1000, score_thr=0.05, nms_thr=0.5,
                  max_per_img=100)
        ec.update(self.test_cfg or {})
        self._ec = ec
        self._cls_loss = FocalLoss(gamma=2.0, alpha=0.25)
        self._init_loss = SmoothL1Loss(beta=0.11, loss_weight=0.5)
        self._refine_loss = SmoothL1Loss(beta=0.11, loss_weight=1.0)

    def extract_feat(self, imgs):
        return self._neck(self._backbone(imgs))

    def __call__(self, imgs):
        return self._head(self.extract_feat(imgs))

    def _flatten(self, outs):
        cls_out, init_out, refine_out = outs
        b = cls_out[0].shape[0]
        c = self._head.cls_out_channels
        n2 = 2 * self._head.num_points
        return (jnp.concatenate([x.reshape(b, -1, c) for x in cls_out], 1),
                jnp.concatenate([x.reshape(b, -1, n2)
                                 for x in init_out], 1),
                jnp.concatenate([x.reshape(b, -1, n2)
                                 for x in refine_out], 1))

    def _decode(self, pts_flat):
        """point offsets (in stride units, (dy, dx) pairs) → image boxes
        via the configured transform (reppoints_head.py points2bbox)."""
        st = self._pstrides[:, None]
        dy = pts_flat[..., 0::2] * st
        dx = pts_flat[..., 1::2] * st
        x = self._points[:, 0][:, None] + dx
        y = self._points[:, 1][:, None] + dy
        if self.transform_method == "moment":
            return points2bbox_moment(x, y, self._moment_transfer,
                                      self.moment_mul)
        if self.transform_method == "partial_minmax":
            x, y = x[..., :4], y[..., :4]
        return jnp.stack([x.min(-1), y.min(-1), x.max(-1), y.max(-1)],
                         axis=-1)

    def _center_boxes(self):
        """default boxes around each point at base-scale (used for the
        init-stage assignment, reppoints center init)."""
        half = self._pstrides * self.point_base_scale / 2
        return jnp.stack([
            self._points[:, 0] - half, self._points[:, 1] - half,
            self._points[:, 0] + half, self._points[:, 1] + half], -1)

    def loss(self, imgs, gt_boxes, gt_valid, gt_labels, img_shapes):
        cls_flat, init_flat, refine_flat = self._flatten(
            self._head(self.extract_feat(imgs)))
        b = imgs.shape[0]
        init_boxes = jax.vmap(self._decode)(init_flat)
        refine_boxes = jax.vmap(self._decode)(refine_flat)

        def assign_one(g, v, l, cand):
            res = max_iou_assign(cand, g, v, l, pos_iou_thr=0.5,
                                 neg_iou_thr=0.4, min_pos_iou=0.0)
            return res.gt_inds, res.labels

        # init stage: scale-matched closest-point assignment
        # (PointAssigner parity, point_assigner.py)
        from ...core.assign import point_assign

        def init_assign(g, v, l):
            res = point_assign(self._points, self._pstrides, g, v, l,
                               scale=self.point_base_scale)
            return res.gt_inds

        a_init = jax.vmap(init_assign)(gt_boxes, gt_valid, gt_labels)
        # refine stage: assign by the detached init boxes
        a_ref, lab_ref = jax.vmap(assign_one)(
            gt_boxes, gt_valid, gt_labels,
            jax.lax.stop_gradient(init_boxes))

        def matched(assigned):
            safe = jnp.clip(assigned - 1, 0, gt_boxes.shape[1] - 1)
            return jnp.take_along_axis(gt_boxes, safe[..., None], axis=1)

        norm = jnp.broadcast_to(
            self._pstrides[None, :, None] * self.point_base_scale,
            init_boxes.shape)
        pos_i = (a_init > 0)
        n_i = jnp.maximum(pos_i.sum(), 1.0)
        loss_init = self._init_loss(
            init_boxes / norm, matched(a_init) / norm,
            weight=jnp.broadcast_to(pos_i[..., None], init_boxes.shape)
            .astype(jnp.float32), avg_factor=n_i * 4)

        pos_r = (a_ref > 0)
        n_r = jnp.maximum(pos_r.sum(), 1.0)
        loss_refine = self._refine_loss(
            refine_boxes / norm, matched(a_ref) / norm,
            weight=jnp.broadcast_to(pos_r[..., None], refine_boxes.shape)
            .astype(jnp.float32), avg_factor=n_r * 4)
        loss_cls = self._cls_loss(cls_flat, lab_ref, avg_factor=n_r)
        return dict(loss_cls=loss_cls, loss_pts_init=loss_init,
                    loss_pts_refine=loss_refine)

    def predict(self, imgs, img_shapes, scale_factors=None):
        cls_flat, _, refine_flat = self._flatten(
            self._head(self.extract_feat(imgs)))
        boxes_all = jax.vmap(self._decode)(refine_flat)
        ec = self._ec

        def single(cls_s, boxes, shape):
            scores_all = jax.nn.sigmoid(cls_s)
            lvl_boxes, lvl_scores = [], []
            start = 0
            for n_lvl in self._level_sizes:
                sl = slice(start, start + n_lvl)
                start += n_lvl
                s = scores_all[sl]
                k = min(ec["nms_pre"], n_lvl)
                _, top_i = jax.lax.top_k(s.max(-1), k)
                bsel = boxes[sl][top_i]
                bsel = jnp.stack([
                    jnp.clip(bsel[:, 0], 0, shape[1]),
                    jnp.clip(bsel[:, 1], 0, shape[0]),
                    jnp.clip(bsel[:, 2], 0, shape[1]),
                    jnp.clip(bsel[:, 3], 0, shape[0])], -1)
                lvl_boxes.append(bsel)
                lvl_scores.append(s[top_i])
            b_cat = jnp.concatenate(lvl_boxes)
            s_cat = jnp.concatenate(lvl_scores)
            s_cat = jnp.concatenate(
                [jnp.zeros((s_cat.shape[0], 1), s_cat.dtype), s_cat], -1)
            return multiclass_nms(b_cat, s_cat, ec["score_thr"],
                                  ec["nms_thr"], ec["max_per_img"])
        res = jax.vmap(single)(cls_flat, boxes_all, img_shapes)
        boxes = res.boxes
        if scale_factors is not None:
            boxes = boxes / scale_factors[:, None, None]
        return dict(boxes=boxes, scores=res.scores, labels=res.labels,
                    valid=res.valid)
