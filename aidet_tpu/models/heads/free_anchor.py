"""FreeAnchor: learning-to-match bag loss for RetinaNet.

TPU-native rework of FreeAnchorRetinaHead.loss
(mmdet/models/anchor_heads/free_anchor_retina_head.py:35-188): the
per-image Python loop and sparse-tensor tricks become one vmapped,
fully padded program —
  - the sparse "image_box_prob" max over objects of each class is a
    segment-max over the padded gt axis;
  - bags are a static [G, topk] gather;
  - invalid gt slots carry zero probability and drop out of both the
    positive and negative terms exactly like absent objects.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.boxes import bbox2delta, bbox_overlaps, delta2bbox


def _smooth_l1(x, beta):
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def free_anchor_loss(cls_flat, box_flat, anchors,
                     gt_boxes, gt_valid, gt_labels,
                     num_classes: int,
                     target_means=(0., 0., 0., 0.),
                     target_stds=(1., 1., 1., 1.),
                     pre_anchor_topk: int = 50,
                     bbox_thr: float = 0.6,
                     gamma: float = 2.0,
                     alpha: float = 0.5,
                     smoothl1_beta: float = 0.11,
                     bbox_loss_weight: float = 0.75):
    """Bag-of-anchors likelihood loss.

    Args:
      cls_flat: [B, A, C] class logits (sigmoid semantics, C = fg classes).
      box_flat: [B, A, 4] deltas.
      anchors: [A, 4].
      gt_boxes: [B, G, 4]; gt_valid: [B, G]; gt_labels: [B, G] 1-based.
    Returns dict(positive_bag_loss, negative_bag_loss).
    """
    c = cls_flat.shape[-1]

    def single(cls_s, box_p, gt_b, gt_v, gt_l):
        cls_prob = jax.nn.sigmoid(cls_s)                     # [A, C]
        lbl0 = jnp.clip(gt_l - 1, 0, c - 1)                  # 0-based

        # --- image_box_prob (no grad; free_anchor:70-122) ---
        pred_boxes = jax.lax.stop_gradient(
            delta2bbox(anchors, box_p, target_means, target_stds))
        obj_iou = bbox_overlaps(gt_b, pred_boxes)            # [G, A]
        obj_iou = jnp.where(gt_v[:, None], obj_iou, 0.0)
        t1 = bbox_thr
        t2 = jnp.maximum(obj_iou.max(axis=1, keepdims=True),
                         t1 + 1e-12)
        obj_box_prob = jnp.clip((obj_iou - t1) / (t2 - t1), 0.0, 1.0)
        obj_box_prob = jnp.where(gt_v[:, None], obj_box_prob, 0.0)
        # P{a_j ∈ A+} per class: max over the gts of that class
        image_box_prob = jax.ops.segment_max(
            obj_box_prob, lbl0, num_segments=c,
            indices_are_sorted=False)                        # [C, A]
        image_box_prob = jnp.maximum(image_box_prob, 0.0).T  # [A, C]
        image_box_prob = jax.lax.stop_gradient(image_box_prob)

        # --- positive bags (free_anchor:125-158) ---
        qual = bbox_overlaps(gt_b, anchors)                  # [G, A]
        _, matched = jax.lax.top_k(qual, pre_anchor_topk)    # [G, K]
        m_cls = cls_prob[matched]                            # [G, K, C]
        m_cls_prob = jnp.take_along_axis(
            m_cls, lbl0[:, None, None], axis=-1)[..., 0]     # [G, K]
        m_anchors = anchors[matched]                         # [G, K, 4]
        m_targets = bbox2delta(
            m_anchors.reshape(-1, 4),
            jnp.repeat(gt_b, pre_anchor_topk, axis=0),
            target_means, target_stds).reshape(m_anchors.shape)
        l_bbox = bbox_loss_weight * _smooth_l1(
            box_p[matched] - m_targets, smoothl1_beta).sum(-1)
        m_box_prob = jnp.exp(-l_bbox)                        # [G, K]

        # positive_bag_loss (free_anchor:168-177): mean-max via the
        # 1/(1-p) softmax-like weighting
        m_prob = m_cls_prob * m_box_prob
        w = 1.0 / jnp.clip(1.0 - m_prob, 1e-12, None)
        w = w / w.sum(axis=1, keepdims=True)
        bag_prob = (w * m_prob).sum(axis=1)                  # [G]
        pos_loss = alpha * -jnp.log(jnp.clip(bag_prob, 1e-12, 1.0))
        pos_loss = jnp.where(gt_v, pos_loss, 0.0).sum()

        # negative_bag_loss (free_anchor:179-184)
        neg_prob = cls_prob * (1.0 - image_box_prob)
        neg_loss = (1.0 - alpha) * (
            neg_prob ** gamma
            * -jnp.log(jnp.clip(1.0 - neg_prob, 1e-12, 1.0))).sum()
        return pos_loss, neg_loss, gt_v.sum()

    pos, neg, npos = jax.vmap(single)(cls_flat, box_flat, gt_boxes,
                                      gt_valid, gt_labels)
    num_pos = jnp.maximum(npos.sum(), 1).astype(jnp.float32)
    return dict(
        positive_bag_loss=pos.sum() / num_pos,
        negative_bag_loss=neg.sum() / (num_pos * pre_anchor_topk))
