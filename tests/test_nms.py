"""NMS family tests vs. numpy greedy oracles (legacy +1 IoU)."""

import jax.numpy as jnp
import numpy as np

from aidet_tpu.core import rboxes
from aidet_tpu.ops.nms import (nms, soft_nms, rnms, multiclass_nms,
                               select_parallel_rboxes, batched_nms)


def _iou_np(b1, b2):
    area1 = (b1[:, 2] - b1[:, 0] + 1) * (b1[:, 3] - b1[:, 1] + 1)
    area2 = (b2[:, 2] - b2[:, 0] + 1) * (b2[:, 3] - b2[:, 1] + 1)
    xx1 = np.maximum(b1[:, None, 0], b2[None, :, 0])
    yy1 = np.maximum(b1[:, None, 1], b2[None, :, 1])
    xx2 = np.minimum(b1[:, None, 2], b2[None, :, 2])
    yy2 = np.minimum(b1[:, None, 3], b2[None, :, 3])
    inter = (np.clip(xx2 - xx1 + 1, 0, None)
             * np.clip(yy2 - yy1 + 1, 0, None))
    return inter / (area1[:, None] + area2[None] - inter)


def _greedy_nms_np(boxes, scores, thr):
    order = np.argsort(-scores)
    iou = _iou_np(boxes, boxes)
    keep = np.zeros(len(boxes), bool)
    for i in order:
        if not any(keep[j] and iou[i, j] > thr for j in range(len(boxes))):
            keep[i] = True
    return keep


def random_dets(n, seed):
    rng = np.random.RandomState(seed)
    b = rng.uniform(0, 100, (n, 2)).astype(np.float32)
    boxes = np.concatenate([b, b + rng.uniform(5, 60, (n, 2))], -1)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    return boxes.astype(np.float32), scores


def test_nms_matches_numpy_oracle():
    for seed in range(5):
        boxes, scores = random_dets(60, seed)
        ours = np.asarray(nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
        oracle = _greedy_nms_np(boxes, scores, 0.5)
        np.testing.assert_array_equal(ours, oracle)


def test_nms_reference_docstring_case():
    # the xdoctest example from the reference (ops/nms/nms_wrapper.py:25-34):
    # 7 boxes at iou_thr=0.7 keep exactly 3
    dets = np.array([[49.1, 32.4, 51.0, 35.9, 0.9],
                     [49.3, 32.9, 51.0, 35.3, 0.9],
                     [49.2, 31.8, 51.0, 35.4, 0.5],
                     [35.1, 11.5, 39.1, 15.7, 0.5],
                     [35.6, 11.8, 39.3, 14.2, 0.5],
                     [35.3, 11.5, 39.9, 14.5, 0.4],
                     [35.2, 11.7, 39.7, 15.7, 0.3]], np.float32)
    keep = np.asarray(nms(jnp.asarray(dets[:, :4]), jnp.asarray(dets[:, 4]),
                          0.7))
    assert keep.sum() == 3
    oracle = _greedy_nms_np(dets[:, :4], dets[:, 4], 0.7)
    np.testing.assert_array_equal(keep, oracle)


def test_nms_multi_tile_matches_oracle():
    # > _NMS_TILE boxes with heavy overlap → exercises cross-tile
    # suppression and within-tile fixpoint chains
    rng = np.random.RandomState(42)
    n = 600
    b = rng.uniform(0, 60, (n, 2)).astype(np.float32)  # dense → long chains
    boxes = np.concatenate([b, b + rng.uniform(5, 30, (n, 2))], -1)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    ours = np.asarray(nms(jnp.asarray(boxes.astype(np.float32)),
                          jnp.asarray(scores), 0.5))
    oracle = _greedy_nms_np(boxes, scores, 0.5)
    np.testing.assert_array_equal(ours, oracle)


def test_nms_respects_valid_mask():
    boxes, scores = random_dets(30, 7)
    valid = np.zeros(30, bool)
    valid[:10] = True
    keep = np.asarray(nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                          jnp.asarray(valid)))
    assert not keep[10:].any()
    oracle = _greedy_nms_np(boxes[:10], scores[:10], 0.5)
    np.testing.assert_array_equal(keep[:10], oracle)


def test_nms_presorted_matches_unsorted():
    """presorted=True on descending scores must reproduce plain nms."""
    boxes, scores = random_dets(64, 11)
    order = np.argsort(-scores)
    b_s, s_s = boxes[order], scores[order]
    keep_ref = np.asarray(nms(jnp.asarray(boxes), jnp.asarray(scores),
                              0.5))
    keep_pre = np.asarray(nms(jnp.asarray(b_s), jnp.asarray(s_s), 0.5,
                              presorted=True))
    np.testing.assert_array_equal(keep_pre, keep_ref[order])
    # with a validity mask (padding ranked last)
    valid = np.ones(64, bool); valid[50:] = False
    s2 = scores.copy(); s2[~valid] = -1e10
    order2 = np.argsort(-s2)
    keep_ref2 = np.asarray(nms(jnp.asarray(boxes), jnp.asarray(s2),
                               0.5, jnp.asarray(valid)))
    keep_pre2 = np.asarray(nms(jnp.asarray(boxes[order2]),
                               jnp.asarray(s2[order2]), 0.5,
                               jnp.asarray(valid[order2]),
                               presorted=True))
    np.testing.assert_array_equal(keep_pre2, keep_ref2[order2])


def test_soft_nms_decays_overlapping():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    new_scores, keep = soft_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                iou_thr=0.3, method="linear")
    new_scores = np.asarray(new_scores)
    assert keep.all()
    assert np.isclose(new_scores[0], 0.9, atol=1e-5)   # top box untouched
    assert new_scores[1] < 0.8                          # decayed
    assert np.isclose(new_scores[2], 0.7, atol=1e-5)   # disjoint untouched


def test_soft_nms_gaussian_and_naive():
    boxes, scores = random_dets(20, 8)
    for method in ("gaussian", "naive"):
        new_scores, keep = soft_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                    method=method)
        assert np.asarray(new_scores).shape == (20,)
    # naive == hard nms on keep decision
    _, keep_naive = soft_nms(jnp.asarray(boxes), jnp.asarray(scores),
                             iou_thr=0.5, method="naive", min_score=1e-3)
    keep_hard = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5)
    np.testing.assert_array_equal(np.asarray(keep_naive),
                                  np.asarray(keep_hard))


def test_rnms_suppresses_rotated_duplicates():
    t = np.array([[50, 50, 40, 10, -0.7],
                  [50, 50, 40, 10, -0.69],   # near-duplicate
                  [150, 150, 40, 10, -0.7]], np.float32)
    quads = rboxes.thetaobb2pointobb(jnp.asarray(t))
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep = np.asarray(rnms(quads, scores, iou_thr=0.5))
    np.testing.assert_array_equal(keep, [True, False, True])


def test_rnms_keeps_crossing_rects():
    # perpendicular crossing rects have low IoU -> both kept
    t = np.array([[50, 50, 40, 8, -1e-3],
                  [50, 50, 8, 40, -1e-3]], np.float32)
    quads = rboxes.thetaobb2pointobb(jnp.asarray(t))
    keep = np.asarray(rnms(quads, jnp.asarray([0.9, 0.8]), iou_thr=0.3))
    assert keep.all()


def test_multiclass_nms_basic():
    # 2 classes; duplicate boxes within a class suppressed, across kept
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [0, 0, 10, 10],
                      [40, 40, 50, 50]], np.float32)
    scores = np.array([  # background, c0, c1
        [0.1, 0.9, 0.05],
        [0.1, 0.8, 0.05],
        [0.1, 0.05, 0.85],
        [0.1, 0.7, 0.05]], np.float32)
    res = multiclass_nms(jnp.asarray(boxes), jnp.asarray(scores),
                         score_thr=0.3, iou_thr=0.5, max_num=10)
    v = np.asarray(res.valid)
    labels = np.asarray(res.labels)[v]
    sc = np.asarray(res.scores)[v]
    # kept: (c0, 0.9), (c1, 0.85), (c0, 0.7); suppressed: (c0, 0.8 dup)
    assert v.sum() == 3
    np.testing.assert_allclose(sorted(sc), [0.7, 0.85, 0.9], atol=1e-5)
    assert sorted(labels.tolist()) == [0, 0, 1]


def test_multiclass_nms_score_threshold_and_padding():
    boxes, scores1 = random_dets(16, 9)
    scores = np.stack([1 - scores1, scores1], -1).astype(np.float32)
    valid = np.zeros(16, bool)
    valid[:8] = True
    res = multiclass_nms(jnp.asarray(boxes), jnp.asarray(scores),
                         score_thr=0.99, max_num=5,
                         valid=jnp.asarray(valid))
    assert not np.asarray(res.valid).any()
    assert (np.asarray(res.labels) == -1).all()


def test_multiclass_nms_per_class_boxes():
    # per-class regression layout [N, C*4] incl. background group
    n = 6
    rng = np.random.RandomState(10)
    base = rng.uniform(0, 50, (n, 2))
    boxes_c0 = np.concatenate([base, base + 10], -1)
    boxes_c1 = boxes_c0 + 100
    bg = np.zeros_like(boxes_c0)
    multi = np.concatenate([bg, boxes_c0, boxes_c1], -1).astype(np.float32)
    scores = np.tile(np.array([[0.1, 0.6, 0.3]], np.float32), (n, 1))
    res = multiclass_nms(jnp.asarray(multi), jnp.asarray(scores),
                         score_thr=0.2, iou_thr=0.5, max_num=20)
    v = np.asarray(res.valid)
    out_boxes = np.asarray(res.boxes)[v]
    out_labels = np.asarray(res.labels)[v]
    # class-1 boxes live at +100 offset
    for b, l in zip(out_boxes, out_labels):
        if l == 1:
            assert b[0] >= 99
        else:
            assert b[0] < 60


def test_select_parallel_rboxes():
    n = 5
    rng = np.random.RandomState(11)
    boxes, s1 = random_dets(n, 11)
    scores = np.stack([1 - s1, s1], -1).astype(np.float32)
    res = multiclass_nms(jnp.asarray(boxes), jnp.asarray(scores),
                         score_thr=0.0, iou_thr=0.5, max_num=8)
    # fabricate per-class thetaobb decode [N, 2 groups * 5]
    dec = rng.uniform(0, 100, (n, 10)).astype(np.float32)
    sel = np.asarray(select_parallel_rboxes(jnp.asarray(dec), res, 5))
    v = np.asarray(res.valid)
    for k in np.nonzero(v)[0]:
        roi = int(np.asarray(res.roi_idx)[k])
        grp = int(np.asarray(res.labels)[k]) + 1
        np.testing.assert_allclose(sel[k], dec[roi, grp * 5:(grp + 1) * 5])
    assert (sel[~v] == 0).all()


def test_batched_nms_classes_dont_interact():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    idxs = jnp.asarray([0, 1])
    keep = np.asarray(batched_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                  idxs, 0.5))
    assert keep.all()
    keep_same = np.asarray(batched_nms(jnp.asarray(boxes),
                                       jnp.asarray(scores),
                                       jnp.asarray([0, 0]), 0.5))
    np.testing.assert_array_equal(keep_same, [True, False])


def _dense_scene(n_clusters, per_cluster, seed):
    """DOTA-like dense same-class scene: tight clusters of near-duplicate
    small boxes (think parking-lot small-vehicles)."""
    rng = np.random.RandomState(seed)
    centers = rng.uniform(0, 1000, (n_clusters, 2))
    boxes, scores = [], []
    for c in centers:
        for _ in range(per_cluster):
            jit = c + rng.uniform(-1.5, 1.5, 2)
            wh = rng.uniform(12, 16, 2)
            boxes.append([jit[0], jit[1], jit[0] + wh[0], jit[1] + wh[1]])
            scores.append(rng.uniform(0.05, 1.0))
    boxes = np.asarray(boxes, np.float32)
    scores = np.asarray(scores, np.float32)
    return boxes, scores


def test_multiclass_nms_dense_scene_truncation_holds():
    # 150 clusters x 6 near-duplicates = 900 same-class candidates.
    # The default pre_nms_top_k=256 truncation must reproduce the exact
    # (untruncated) top-max_num output on this dense scene — the
    # regime ops/nms.py's approximation comment is about.
    boxes, s1 = _dense_scene(150, 6, seed=3)
    n = boxes.shape[0]
    scores = np.stack([1 - s1, s1], -1).astype(np.float32)
    kw = dict(score_thr=0.05, iou_thr=0.5, max_num=100)
    approx = multiclass_nms(jnp.asarray(boxes), jnp.asarray(scores),
                            pre_nms_top_k=256, **kw)
    exact = multiclass_nms(jnp.asarray(boxes), jnp.asarray(scores),
                           pre_nms_top_k=0, **kw)
    va, ve = np.asarray(approx.valid), np.asarray(exact.valid)
    assert ve.sum() > 0
    np.testing.assert_array_equal(va, ve)
    np.testing.assert_allclose(np.asarray(approx.scores)[va],
                               np.asarray(exact.scores)[ve], atol=1e-6)
    np.testing.assert_allclose(np.asarray(approx.boxes)[va],
                               np.asarray(exact.boxes)[ve], atol=1e-5)
