"""Fixed-shape NMS family for TPU: hard NMS, soft-NMS, rotated NMS,
and the multiclass orchestration the detector heads consume.

TPU-native replacements for the reference's CUDA/CPU kernels and
Python orchestration:
  - hard NMS        ← mmdet/ops/nms/src/nms_kernel.cu (greedy bitmask)
  - soft-NMS        ← mmdet/ops/nms/src/nms_cpu.cpp (linear/gaussian)
  - multiclass_nms  ← mmdet/core/post_processing/bbox_nms.py:6-76
  - multiclass_nms_with_index + thetaobb_nms_by_bbox_nms
                    ← mmdet/core/post_processing/rbbox_nms.py:6-118
  - rotated NMS     ← NEW (the reference reused HBB keep indices and
                      delegated scene merge to external wwtool)

Everything here is statically shaped: inputs are padded arrays with
validity encoded by sentinel scores (-inf / 0), outputs are padded
top-K with a boolean valid mask — no data-dependent shapes, so the
whole post-processing graph stays inside one jit program.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.boxes import bbox_overlaps

NEG_INF = -1e10


_NMS_TILE = 256


def _greedy_keep(iou_sorted_mat: jax.Array, order: jax.Array,
                 valid_sorted: jax.Array, iou_thr: float) -> jax.Array:
    """Exact greedy suppression.

    Args:
      iou_sorted_mat: [N, N] IoU of the boxes ALREADY in descending
        score order (computing IoU after the sort avoids a 2·N² gather).
      order: [N] the sort permutation (to scatter keep back).
      valid_sorted: [N] validity in sorted order.

    Semantics match the reference's CUDA bitmask kernel
    (mmdet/ops/nms/src/nms_kernel.cu): a box is kept iff no
    higher-scoring *kept* box overlaps it above the threshold.

    TPU-first formulation: instead of an N-step sequential scan, boxes
    (in score order) are processed in tiles of T.  Each tile is first
    masked against all previously-kept boxes in one [T, N] matrix op,
    then resolved internally by iterating
        alive_{k+1}[j] = ¬∃ i<j : alive_k[i] ∧ iou[i,j] > thr
    to its fixpoint — after k iterations every suppression chain of
    depth ≤ k is resolved, so the fixpoint IS the greedy solution.
    Sequential steps drop from N to (N/T)·(fixpoint iters + 1).
    """
    keep_sorted = _greedy_keep_presupp(iou_sorted_mat > iou_thr,
                                       valid_sorted)
    n = iou_sorted_mat.shape[0]
    return jnp.zeros(n, bool).at[order].set(keep_sorted)


def _greedy_keep_presupp(supp_in: jax.Array,
                         valid_sorted: jax.Array) -> jax.Array:
    """Greedy keep over a PRE-THRESHOLDED [N, N] bool suppression
    matrix whose rows/cols are already in descending-score order.
    Returns the keep mask in that same order."""
    n = supp_in.shape[0]

    t = min(_NMS_TILE, n)
    num_tiles = -(-n // t)
    pad = num_tiles * t - n
    if pad:
        supp = jnp.pad(supp_in, ((0, pad), (0, pad)))
        valid_sorted = jnp.pad(valid_sorted, (0, pad))
    else:
        supp = supp_in
    np_ = num_tiles * t
    idx = jnp.arange(np_)

    def tile_body(ti, keep):
        sl = ti * t
        rows = jax.lax.dynamic_slice(supp, (sl, 0), (t, np_))   # [T, NP]
        tile_valid = jax.lax.dynamic_slice(valid_sorted, (sl,), (t,))
        # suppressed by any kept box from earlier tiles
        earlier = idx < sl
        supp_prev = jnp.any(rows & (keep & earlier)[None, :], axis=1)
        cand = tile_valid & ~supp_prev

        self_rows = jax.lax.dynamic_slice(rows, (0, sl), (t, t))  # [T, T]
        upper = (jnp.arange(t)[:, None] < jnp.arange(t)[None, :])
        m = self_rows & upper                                    # i<j pairs

        def fix_cond(state):
            alive, prev_alive, it = state
            return (it < t) & jnp.any(alive != prev_alive)

        def fix_body(state):
            alive, _, it = state
            suppressed = jnp.any(m & alive[:, None], axis=0)
            return cand & ~suppressed, alive, it + 1

        alive0 = cand
        a1 = cand & ~jnp.any(m & alive0[:, None], axis=0)
        alive, _, _ = jax.lax.while_loop(
            fix_cond, fix_body, (a1, alive0, jnp.int32(1)))
        return jax.lax.dynamic_update_slice(keep, alive, (sl,))

    return jax.lax.fori_loop(0, num_tiles, tile_body,
                             jnp.zeros(np_, bool))[:n]


def _suppression_matrix(boxes: jax.Array, iou_thr: float) -> jax.Array:
    """[N, N] bool: IoU(i, j) > thr, computed WITHOUT materialising the
    f32 IoU matrix — scalar per-coordinate broadcasts fuse into one
    elementwise loop and ``inter > thr·union`` avoids the divide
    (~2x faster than ``bbox_overlaps(b, b) > thr`` on TPU)."""
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    w = jnp.clip(xx2 - xx1 + 1.0, 0, None)   # legacy +1 (bbox_overlaps)
    h = jnp.clip(yy2 - yy1 + 1.0, 0, None)
    inter = w * h
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    union = area[:, None] + area[None, :] - inter
    return inter > iou_thr * union


@functools.partial(jax.jit, static_argnames=("iou_thr", "presorted"))
def nms(boxes: jax.Array, scores: jax.Array, iou_thr: float = 0.5,
        valid: jax.Array | None = None,
        presorted: bool = False) -> jax.Array:
    """Hard greedy NMS on horizontal boxes.

    Args:
      boxes: [N, 4]; scores: [N]; valid: optional [N] bool.
      presorted: caller guarantees scores are already DESCENDING with
        invalid entries ranked last (e.g. straight out of top_k) —
        skips the argsort/gather (~3 ms at N=2000 on TPU).
    Returns: keep mask [N] (bool).
    """
    if valid is None:
        valid = jnp.ones(scores.shape, bool)
    if presorted:
        return _greedy_keep_presupp(
            _suppression_matrix(boxes, iou_thr), valid)
    order = jnp.argsort(-jnp.where(valid, scores, NEG_INF))
    boxes_s = boxes[order]
    keep_sorted = _greedy_keep_presupp(
        _suppression_matrix(boxes_s, iou_thr), valid[order])
    return jnp.zeros(order.shape[0], bool).at[order].set(keep_sorted)


@functools.partial(jax.jit, static_argnames=("iou_thr", "presorted"))
def rnms(quads: jax.Array, scores: jax.Array, iou_thr: float = 0.1,
         valid: jax.Array | None = None,
         presorted: bool = False) -> jax.Array:
    """Rotated (polygon) greedy NMS on [N, 8] quads — the true rotated
    suppression the reference lacked natively (SURVEY.md §2.1)."""
    from ..core.riou import quad_overlaps
    if valid is None:
        valid = jnp.ones(scores.shape, bool)
    if presorted:
        return _greedy_keep_presupp(
            quad_overlaps(quads, quads) > iou_thr, valid)
    order = jnp.argsort(-jnp.where(valid, scores, NEG_INF))
    quads_s = quads[order]
    iou = quad_overlaps(quads_s, quads_s)
    return _greedy_keep(iou, order, valid[order], iou_thr)


@functools.partial(jax.jit,
                   static_argnames=("iou_thr", "method", "sigma"))
def soft_nms(boxes: jax.Array, scores: jax.Array, iou_thr: float = 0.3,
             method: str = "linear", sigma: float = 0.5,
             min_score: float = 1e-3,
             valid: jax.Array | None = None):
    """Soft-NMS: decay instead of suppress.

    Parity: mmdet/ops/nms/src/nms_cpu.cpp (soft_nms_cpu; linear and
    gaussian decay; 'naive' == hard threshold).

    Returns (new_scores [N], keep [N] bool): keep marks boxes whose
    decayed score stayed above ``min_score``; new_scores are the
    decayed scores (0 where not kept).
    """
    assert method in ("linear", "gaussian", "naive")
    n = scores.shape[0]
    if valid is None:
        valid = jnp.ones(scores.shape, bool)
    iou = bbox_overlaps(boxes, boxes)
    scores0 = jnp.where(valid, scores, NEG_INF)

    def body(carry, _):
        cur_scores, done = carry
        i = jnp.argmax(jnp.where(done, NEG_INF, cur_scores))
        top = cur_scores[i]
        alive = top > min_score
        row = iou[i]
        if method == "linear":
            decay = jnp.where(row > iou_thr, 1.0 - row, 1.0)
        elif method == "gaussian":
            decay = jnp.exp(-(row * row) / sigma)
        else:
            decay = jnp.where(row > iou_thr, 0.0, 1.0)
        new_scores = jnp.where(done | (jnp.arange(n) == i),
                               cur_scores, cur_scores * decay)
        new_scores = jnp.where(alive, new_scores, cur_scores)
        done = done.at[i].set(True)
        return (new_scores, done), (i, alive)

    (final_scores, _), (picked, alive) = jax.lax.scan(
        body, (scores0, ~valid), None, length=n)
    keep = jnp.zeros(n, bool).at[picked].max(alive)
    keep &= final_scores > min_score
    out_scores = jnp.where(keep, final_scores, 0.0)
    return out_scores, keep


class NMSResult(NamedTuple):
    """Fixed-size multiclass NMS output (all arrays length ``max_num``)."""
    boxes: jax.Array    # [K, D] selected (decoded) boxes
    scores: jax.Array   # [K]
    labels: jax.Array   # [K] 0-based class labels (-1 if invalid)
    valid: jax.Array    # [K] bool
    roi_idx: jax.Array  # [K] index of the source roi/anchor (-1 if invalid)


def _per_class_boxes(multi_bboxes, num_classes, dim):
    """[N, C*dim] or [N, dim] → [C-1, N, dim] (background col 0 dropped
    when per-class), mirroring bbox_nms.py:35-40."""
    n = multi_bboxes.shape[0]
    if multi_bboxes.shape[-1] > dim:
        per = multi_bboxes.reshape(n, -1, dim)
        # reference keeps columns 1..C (drops background column 0)
        per = per[:, 1:num_classes + 1] if per.shape[1] > num_classes \
            else per[:, -num_classes:]
        return jnp.swapaxes(per, 0, 1)
    return jnp.broadcast_to(multi_bboxes[None], (num_classes, n, dim))


def nms_cfg_kwargs(cfg: dict) -> dict:
    """Parse a test_cfg nms selection into multiclass_nms kwargs.

    Parity: bbox_nms.py:45-47 dispatches ``getattr(nms_wrapper,
    nms_type)`` from ``nms_cfg['type']``.  Accepts both this repo's
    flat ``nms_thr`` key and the reference-style
    ``nms=dict(type='soft_nms', iou_thr=..., method=..., sigma=...,
    min_score=...)`` dict.
    """
    out: dict = dict(iou_thr=cfg.get("nms_thr", 0.5))
    ncfg = cfg.get("nms")
    if ncfg:
        d = dict(ncfg)
        t = d.pop("type", "nms")
        out["iou_thr"] = d.pop("iou_thr", out["iou_thr"])
        if t == "soft_nms":
            out["nms_type"] = "soft_nms"
            out["soft_method"] = d.pop("method", "linear")
            out["sigma"] = d.pop("sigma", 0.5)
            out["min_score"] = d.pop("min_score", 1e-3)
        elif t != "nms":
            raise ValueError(f"unknown nms type {t!r}")
    return out


@functools.partial(
    jax.jit,
    static_argnames=("score_thr", "iou_thr", "max_num", "box_dim",
                     "pre_nms_top_k", "nms_type", "soft_method",
                     "sigma", "min_score"))
def multiclass_nms(multi_bboxes: jax.Array, multi_scores: jax.Array,
                   score_thr: float, iou_thr: float = 0.5,
                   max_num: int = 100, score_factors=None,
                   valid: jax.Array | None = None,
                   box_dim: int = 4,
                   pre_nms_top_k: int = 256,
                   nms_type: str = "nms",
                   soft_method: str = "linear",
                   sigma: float = 0.5,
                   min_score: float = 1e-3) -> NMSResult:
    """Per-class NMS over padded candidates, fixed-size top-K output.

    Parity: mmdet/core/post_processing/bbox_nms.py:6-76 — per-class
    independent suppression (their class-offset trick), score filter,
    then global top ``max_num``.  Here classes are vmapped instead of
    coordinate-offset, which is exactly equivalent and keeps shapes
    static.

    ``nms_type='soft_nms'`` routes each class through soft-NMS
    (nms_wrapper.py:63-110) — kept detections carry their DECAYED
    scores into the global top-``max_num`` ranking.

    Args:
      multi_bboxes: [N, C*box_dim] (col 0 = background group) or [N, box_dim].
      multi_scores: [N, C+1] with background scores in column 0.
      valid: [N] candidate validity (padding mask).
    """
    assert nms_type in ("nms", "soft_nms")
    if nms_type == "soft_nms" and box_dim != 4:
        raise ValueError("soft_nms supports horizontal boxes only "
                         "(reference nms_cpu.cpp is HBB-only)")
    n = multi_scores.shape[0]
    num_classes = multi_scores.shape[1] - 1
    if valid is None:
        valid = jnp.ones(n, bool)

    scores = multi_scores[:, 1:]                       # [N, C]
    if score_factors is not None:
        scores = scores * score_factors[:, None]
    scores_t = jnp.swapaxes(scores, 0, 1)              # [C, N]
    boxes_t = _per_class_boxes(multi_bboxes, num_classes, box_dim)

    cls_valid = valid[None] & (scores_t > score_thr)   # [C, N]

    # perf: restrict each class's NMS to its top-k candidates, shrinking
    # the IoU matrices from N² to k².  This is a recall-preserving
    # APPROXIMATION (like approx_max_k in rpn_proposals), not an exact
    # equivalence: if suppression removes more than k - max_num of a
    # class's top-k, boxes outside the top-k that full per-class NMS
    # would have kept are dropped.  tests/test_nms.py exercises a dense
    # same-class scene to keep the default honest; pass a larger
    # pre_nms_top_k (or 0 to disable) for extremely dense scenes.
    if pre_nms_top_k and pre_nms_top_k < n:
        k = max(pre_nms_top_k, max_num)
        cand_scores = jnp.where(cls_valid, scores_t, NEG_INF)
        top_s, top_i = jax.lax.top_k(cand_scores, k)       # [C, k]
        boxes_k = jnp.take_along_axis(boxes_t, top_i[..., None], axis=1)
        valid_k = top_s > NEG_INF / 2
        if nms_type == "soft_nms":
            dec_s, keep_k = jax.vmap(
                lambda b, s, v: soft_nms(b, s, iou_thr, soft_method,
                                         sigma, min_score, v))(
                boxes_k, top_s, valid_k)
            scores_t = jax.vmap(lambda sc, ti, ds: sc.at[ti].set(ds))(
                scores_t, top_i, dec_s)
        elif box_dim == 4:
            keep_k = jax.vmap(
                lambda b, s, v: nms(b, s, iou_thr, v, presorted=True))(
                boxes_k, top_s, valid_k)
        else:
            keep_k = jax.vmap(
                lambda q, s, v: rnms(q, s, iou_thr, v, presorted=True))(
                boxes_k, top_s, valid_k)
        keep = jnp.zeros_like(cls_valid)
        keep = jax.vmap(lambda km, ti, kk: km.at[ti].set(kk))(
            keep, top_i, keep_k)
        keep &= cls_valid
    elif nms_type == "soft_nms":
        dec_s, keep = jax.vmap(
            lambda b, s, v: soft_nms(b, s, iou_thr, soft_method,
                                     sigma, min_score, v))(
            boxes_t, scores_t, cls_valid)
        scores_t = dec_s
        keep &= cls_valid
    elif box_dim == 4:
        keep = jax.vmap(lambda b, s, v: nms(b, s, iou_thr, v))(
            boxes_t, scores_t, cls_valid)
    else:  # rotated candidates: suppress by polygon IoU
        keep = jax.vmap(lambda q, s, v: rnms(q, s, iou_thr, v))(
            boxes_t, scores_t, cls_valid)

    flat_scores = jnp.where(keep, scores_t, NEG_INF).reshape(-1)   # [C*N]
    k = min(max_num, flat_scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(flat_scores, k)
    if k < max_num:  # pad to the static output size
        pad = max_num - k
        top_scores = jnp.concatenate(
            [top_scores, jnp.full((pad,), NEG_INF, top_scores.dtype)])
        top_idx = jnp.concatenate([top_idx, jnp.zeros(pad, top_idx.dtype)])
    top_cls = top_idx // n
    top_roi = top_idx % n
    top_valid = top_scores > NEG_INF / 2
    top_boxes = boxes_t[top_cls, top_roi]
    return NMSResult(
        boxes=jnp.where(top_valid[:, None], top_boxes, 0.0),
        scores=jnp.where(top_valid, top_scores, 0.0),
        labels=jnp.where(top_valid, top_cls, -1),
        valid=top_valid,
        roi_idx=jnp.where(top_valid, top_roi, -1))


def multiclass_nms_with_index(multi_bboxes, multi_scores, score_thr,
                              iou_thr=0.5, max_num=100, valid=None):
    """Multiclass NMS returning the (class, roi) provenance of each kept
    detection so a parallel rotated branch can reuse the keep decisions.

    TPU-native equivalent of multiclass_nms_with_index +
    thetaobb_nms_by_bbox_nms (rbbox_nms.py:6-118): instead of Python
    lists of per-class index tensors, provenance is the fixed-size
    (labels, roi_idx, valid) triple in :class:`NMSResult`; selecting
    the rotated decode at those (roi, class) pairs reproduces the
    reference's "rbbox NMS by bbox NMS" exactly.
    """
    return multiclass_nms(multi_bboxes, multi_scores, score_thr,
                          iou_thr=iou_thr, max_num=max_num, valid=valid)


def select_parallel_rboxes(rbbox_decoded: jax.Array, res: NMSResult,
                           box_dim: int) -> jax.Array:
    """Gather per-class rotated boxes at the HBB keep decisions.

    Args:
      rbbox_decoded: [N, C*box_dim] decoded rotated boxes where group c
        corresponds to foreground class c-1 (group 0 = background), or
        [N, box_dim] (class-agnostic).
      res: result of :func:`multiclass_nms_with_index` on the HBB branch.
    Returns [K, box_dim] rotated boxes aligned with ``res``.

    Parity: thetaobb_nms_by_bbox_nms (rbbox_nms.py:64-118).
    """
    n = rbbox_decoded.shape[0]
    if rbbox_decoded.shape[-1] == box_dim:
        per = jnp.broadcast_to(rbbox_decoded[None],
                               (1, n, box_dim))
        cls = jnp.zeros_like(res.labels)
    else:
        per = jnp.swapaxes(
            rbbox_decoded.reshape(n, -1, box_dim), 0, 1)  # [G, N, D]
        cls = res.labels + 1   # group 0 is background
    roi = jnp.clip(res.roi_idx, 0, n - 1)
    cls = jnp.clip(cls, 0, per.shape[0] - 1)
    out = per[cls, roi]
    return jnp.where(res.valid[:, None], out, 0.0)


def batched_nms(boxes, scores, idxs, iou_thr, valid=None):
    """Category-aware NMS: boxes with different ``idxs`` never suppress
    each other (torchvision batched_nms semantics, used by the
    reference through its coordinate-offset trick)."""
    if valid is None:
        valid = jnp.ones(scores.shape, bool)
    order = jnp.argsort(-jnp.where(valid, scores, NEG_INF))
    boxes_s = boxes[order]
    idxs_s = idxs[order]
    iou = bbox_overlaps(boxes_s, boxes_s)
    same = idxs_s[:, None] == idxs_s[None, :]
    iou = jnp.where(same, iou, 0.0)
    return _greedy_keep(iou, order, valid[order], iou_thr)
