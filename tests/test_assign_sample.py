"""Assigner/sampler/target tests mirroring the reference's
tests/test_assigner.py and test_sampler.py cases, restated for the
padded fixed-shape API."""

import jax
import jax.numpy as jnp
import numpy as np

from aidet_tpu.core.assign import max_iou_assign
from aidet_tpu.core.sample import (pseudo_sample_masks, random_sample_masks,
                                   sample_fixed, random_topk_mask,
                                   topk_mask_by_score)
from aidet_tpu.core.targets import bbox_target, rbbox_target, mask_target
from aidet_tpu.core import rboxes


def _assign(boxes, gts, gt_valid=None, labels=None, **kw):
    boxes = jnp.asarray(boxes, jnp.float32)
    gts = jnp.asarray(gts, jnp.float32)
    if gt_valid is None:
        gt_valid = jnp.ones(gts.shape[0], bool)
    if labels is not None:
        labels = jnp.asarray(labels, jnp.int32)
    return max_iou_assign(boxes, gts, jnp.asarray(gt_valid), labels, **kw)


def test_max_iou_assigner_reference_case():
    # mirrors tests/test_assigner.py:17-47 (reference)
    boxes = [[0, 0, 10, 10], [10, 10, 20, 20], [5, 5, 15, 15],
             [32, 32, 38, 42]]
    gts = [[0, 0, 10, 9], [0, 10, 10, 19]]
    res = _assign(boxes, gts, labels=[2, 3],
                  pos_iou_thr=0.5, neg_iou_thr=0.5)
    np.testing.assert_array_equal(np.asarray(res.gt_inds), [1, 0, 2, 0])
    np.testing.assert_array_equal(np.asarray(res.labels), [2, 0, 3, 0])


def test_assigner_doctest_case():
    # max_iou_assigner.py:79-84 doctest
    res = _assign([[0, 0, 10, 10], [10, 10, 20, 20]], [[0, 0, 10, 9]],
                  pos_iou_thr=0.5, neg_iou_thr=0.5)
    np.testing.assert_array_equal(np.asarray(res.gt_inds), [1, 0])


def test_assigner_empty_gt():
    # all gts padding → everything background (assign_wrt_overlaps:140-143)
    res = _assign([[0, 0, 10, 10], [10, 10, 20, 20]],
                  [[0, 0, 0, 0]], gt_valid=[False],
                  pos_iou_thr=0.5, neg_iou_thr=0.5)
    np.testing.assert_array_equal(np.asarray(res.gt_inds), [0, 0])


def test_assigner_ignore_region():
    boxes = [[0, 0, 10, 10], [30, 30, 40, 40]]
    gts = [[0, 0, 10, 10]]
    res = _assign(boxes, gts, pos_iou_thr=0.5, neg_iou_thr=0.5,
                  ignore_boxes=jnp.asarray([[28., 28., 42., 42.]]),
                  ignore_valid=jnp.asarray([True]),
                  ignore_iof_thr=0.5)
    out = np.asarray(res.gt_inds)
    assert out[0] == 1
    assert out[1] == -1  # inside ignore region


def test_assigner_neg_range():
    boxes = [[0, 0, 10, 10]]
    gts = [[0, 0, 10, 12]]  # iou ~0.846
    res = _assign(boxes, gts, pos_iou_thr=0.9, neg_iou_thr=(0.0, 0.5),
                  min_pos_iou=0.9)
    # 0.846 not in [0, 0.5) and < 0.9 → stays ignore... but step 4:
    # this box is the gt's best (>= min_pos_iou 0.9? no 0.846<0.9) → -1
    np.testing.assert_array_equal(np.asarray(res.gt_inds), [-1])


def test_assigner_gt_max_assign():
    # low-quality match: best anchor for each gt claimed even below pos thr
    boxes = [[0, 0, 10, 10], [50, 50, 60, 60]]
    gts = [[2, 2, 12, 12]]
    res = _assign(boxes, gts, pos_iou_thr=0.9, neg_iou_thr=0.2,
                  min_pos_iou=0.3)
    assert np.asarray(res.gt_inds)[0] == 1   # claimed by step 4
    assert np.asarray(res.gt_inds)[1] == 0


def test_assigner_later_gt_overwrites():
    # two gts whose best box is the same anchor: higher gt index wins
    boxes = [[0, 0, 10, 10], [100, 100, 110, 110]]
    gts = [[1, 1, 11, 11], [2, 2, 12, 12]]
    res = _assign(boxes, gts, pos_iou_thr=0.95, neg_iou_thr=0.2,
                  min_pos_iou=0.1)
    assert np.asarray(res.gt_inds)[0] == 2


def test_random_topk_mask():
    key = jax.random.PRNGKey(0)
    mask = jnp.asarray([True] * 10 + [False] * 6)
    sel = random_topk_mask(key, mask, 4)
    assert int(sel.sum()) == 4
    assert not np.asarray(sel)[10:].any()
    # k larger than available
    sel2 = random_topk_mask(key, mask, 100)
    assert int(sel2.sum()) == 10


def test_topk_mask_by_score():
    mask = jnp.asarray([True, True, False, True])
    score = jnp.asarray([0.1, 0.9, 5.0, 0.5])
    sel = np.asarray(topk_mask_by_score(mask, score, 2))
    np.testing.assert_array_equal(sel, [False, True, False, True])


def test_random_sample_masks_budget():
    key = jax.random.PRNGKey(1)
    assigned = jnp.asarray([1] * 20 + [0] * 300 + [-1] * 10)
    sm = random_sample_masks(key, assigned, num=256, pos_fraction=0.5)
    assert int(sm.num_pos) == 20          # fewer pos than 128 budget
    assert int(sm.num_neg) == 236          # fills to 256
    assert not (np.asarray(sm.pos) & np.asarray(sm.neg)).any()
    # never selects ignore
    assert not np.asarray(sm.pos)[-10:].any()
    assert not np.asarray(sm.neg)[-10:].any()


def test_random_sample_masks_pos_cap():
    key = jax.random.PRNGKey(2)
    assigned = jnp.asarray([1] * 300 + [0] * 100)
    sm = random_sample_masks(key, assigned, num=256, pos_fraction=0.25)
    assert int(sm.num_pos) == 64
    assert int(sm.num_neg) == 100  # only 100 negatives exist


def test_pseudo_sample():
    assigned = jnp.asarray([2, 0, -1, 1])
    sm = pseudo_sample_masks(assigned)
    np.testing.assert_array_equal(np.asarray(sm.pos),
                                  [True, False, False, True])
    np.testing.assert_array_equal(np.asarray(sm.neg),
                                  [False, True, False, False])


def test_sample_fixed_layout():
    key = jax.random.PRNGKey(3)
    assigned = jnp.asarray([1, 2, 0, 0, 0, 0, -1, 1])
    s = sample_fixed(key, assigned, num=6, pos_fraction=0.5)
    a = np.asarray(assigned)
    is_pos = np.asarray(s.is_pos)
    inds = np.asarray(s.inds)
    valid = np.asarray(s.valid)
    assert is_pos.sum() == 3               # all 3 positives fit budget
    assert valid.sum() == 6                # negatives fill the rest
    # positives come first and map to real positives
    assert (a[inds[is_pos]] > 0).all()
    assert (a[inds[valid & ~is_pos]] == 0).all()
    # gt indices 0-based for pos, -1 otherwise
    gt = np.asarray(s.gt_inds)
    assert (gt[is_pos] >= 0).all() and (gt[~is_pos] == -1).all()


def test_sample_fixed_scarce_negatives():
    key = jax.random.PRNGKey(4)
    assigned = jnp.asarray([1, 0, -1, -1, -1, -1])
    s = sample_fixed(key, assigned, num=4, pos_fraction=0.25)
    assert int(s.valid.sum()) == 2        # 1 pos + 1 neg, 2 padding slots
    assert int(s.is_pos.sum()) == 1


def test_bbox_target():
    key = jax.random.PRNGKey(5)
    cand = jnp.asarray([[0., 0., 10., 10.], [20., 20., 40., 40.],
                        [100., 100., 120., 120.]])
    assigned = jnp.asarray([1, 2, 0])
    s = sample_fixed(key, assigned, num=4, pos_fraction=0.5)
    rois = cand[jnp.clip(s.inds, 0, 2)]
    gt = jnp.asarray([[0., 0., 10., 12.], [18., 20., 40., 42.]])
    labels = jnp.asarray([3, 7])
    t = bbox_target(s, rois, gt, labels, target_stds=(1., 1., 1., 1.))
    lab = np.asarray(t.labels)
    assert set(lab[np.asarray(s.is_pos)].tolist()) == {3, 7}
    assert (np.asarray(t.bbox_weights)[np.asarray(s.is_pos)] == 1).all()
    assert (np.asarray(t.bbox_weights)[~np.asarray(s.is_pos)] == 0).all()


def test_rbbox_target_encodings():
    key = jax.random.PRNGKey(6)
    t = jnp.asarray([[50., 50., 30., 10., -0.5], [150., 150., 40., 20., -1.0]])
    cand = rboxes.thetaobb2bbox(t)
    assigned = jnp.asarray([1, 2])
    s = sample_fixed(key, assigned, num=2, pos_fraction=1.0)
    rois = cand[jnp.clip(s.inds, 0, 1)]
    labels = jnp.asarray([1, 2])
    for enc, gt in [("thetaobb", t),
                    ("pointobb", rboxes.thetaobb2pointobb(t)),
                    ("hobb", rboxes.thetaobb2hobb(t))]:
        out = rbbox_target(s, rois, gt, labels, encode=enc)
        assert bool(jnp.isfinite(out.bbox_targets).all())
        dim = {"thetaobb": 5, "pointobb": 8, "hobb": 5}[enc]
        assert out.bbox_targets.shape == (2, dim)


def test_mask_target_crops():
    key = jax.random.PRNGKey(7)
    # gt mask: left half ones
    m = np.zeros((1, 32, 32), np.float32)
    m[0, :, :16] = 1.0
    assigned = jnp.asarray([1, 0])
    s = sample_fixed(key, assigned, num=2, pos_fraction=0.5)
    cand = jnp.asarray([[0., 0., 31., 31.], [0., 0., 15., 15.]])
    rois = cand[jnp.clip(s.inds, 0, 1)]
    crops = np.asarray(mask_target(s, rois, jnp.asarray(m), mask_size=8))
    pos_row = np.asarray(s.is_pos).argmax()
    crop = crops[pos_row]
    assert crop[:, :3].mean() > 0.9   # left side ~1
    assert crop[:, -3:].mean() < 0.1  # right side ~0
    # negative slot zeroed
    assert (crops[1 - pos_row] == 0).all()


def test_point_assign_clamps_gt_level_into_pyramid():
    """A gt smaller than the finest stride bracket must still be
    assigned to the finest level (PointAssigner clamps gt level to
    [lvl_min, lvl_max]); pre-fix it received ZERO positives."""
    from aidet_tpu.core.assign import point_assign
    # one point per level at the gt center, strides 8..128
    strides = np.array([8, 16, 32, 64, 128], np.float32)
    points = jnp.asarray(np.tile([[20.0, 20.0]], (5, 1)))
    gt = jnp.asarray([[10.0, 10.0, 30.0, 30.0]])     # 20x20: sqrt-area 20
    res = point_assign(points, jnp.asarray(strides), gt,
                       jnp.ones(1, bool), jnp.asarray([3]), scale=4.0)
    assigned = np.asarray(res.gt_inds)
    assert assigned[0] == 1, assigned          # stride-8 point claims it
    assert (assigned[1:] == 0).all(), assigned
    # and a huge gt clamps to the coarsest level
    big = jnp.asarray([[0.0, 0.0, 4000.0, 4000.0]])
    res2 = point_assign(points, jnp.asarray(strides), big,
                        jnp.ones(1, bool), jnp.asarray([3]), scale=4.0)
    assert np.asarray(res2.gt_inds)[4] == 1


def test_sample_fixed_combined_budget_and_balance():
    """Combined (Libra) sampling: pos budget respected, negatives come
    from the IoU-balanced strategy, layout matches FixedSample."""
    from aidet_tpu.core.sample import sample_fixed_combined
    rs = np.random.RandomState(0)
    n = 256
    assigned = np.zeros(n, np.int32)
    assigned[:10] = rs.randint(1, 4, 10)       # 10 positives, 3 gts
    overlaps = rs.uniform(0, 0.5, n).astype(np.float32)
    overlaps[:10] = rs.uniform(0.5, 1.0, 10)
    s = sample_fixed_combined(jax.random.PRNGKey(0),
                              jnp.asarray(assigned),
                              jnp.asarray(overlaps), 64, 0.25,
                              num_gts=3)
    is_pos = np.asarray(s.is_pos)
    assert is_pos.sum() <= 16
    assert np.asarray(s.valid).sum() <= 64
    # every sampled positive really is assigned
    inds = np.asarray(s.inds)
    assert (assigned[inds[is_pos]] > 0).all()


def test_random_topk_mask_bounded_matches_exact():
    """The bounded top_k+threshold fast path must select the identical
    set as the argsort path (random keys are tie-free)."""
    import jax
    from aidet_tpu.core.sample import random_topk_mask

    key = jax.random.PRNGKey(9)
    rng = np.random.RandomState(4)
    for n, k in [(1000, 128), (5000, 256), (300, 300), (50, 128)]:
        mask = jnp.asarray(rng.rand(n) < 0.3)
        exact = random_topk_mask(key, mask, k)
        fast = random_topk_mask(key, mask, k, k_max=k)
        np.testing.assert_array_equal(np.asarray(exact), np.asarray(fast))
        # traced k below the bound
        kt = jnp.int32(k // 2)
        exact = random_topk_mask(key, mask, kt)
        fast = random_topk_mask(key, mask, kt, k_max=k)
        np.testing.assert_array_equal(np.asarray(exact), np.asarray(fast))


def test_assign_bf16_flag_matches_f32_on_clear_cases(monkeypatch):
    # AIDET_ASSIGN_BF16=1 halves the IoU-matrix bandwidth; assignments
    # may flip only for anchors whose IoU sits within bf16 rounding of
    # a threshold.  On random geometry the agreement must be ~total.
    import numpy as np
    import jax.numpy as jnp
    from aidet_tpu.core.assign import max_iou_assign

    rs = np.random.RandomState(0)
    xy = rs.uniform(0, 400, (512, 2)).astype(np.float32)
    wh = rs.uniform(8, 120, (512, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    gxy = rs.uniform(0, 400, (24, 2)).astype(np.float32)
    gwh = rs.uniform(16, 160, (24, 2)).astype(np.float32)
    gt = jnp.asarray(np.concatenate([gxy, gxy + gwh], -1))
    gtv = jnp.asarray(np.ones(24, bool))
    gtl = jnp.asarray(rs.randint(1, 16, 24).astype(np.int32))

    monkeypatch.delenv("AIDET_ASSIGN_BF16", raising=False)
    ref = max_iou_assign(boxes, gt, gtv, gtl)
    monkeypatch.setenv("AIDET_ASSIGN_BF16", "1")
    lo = max_iou_assign(boxes, gt, gtv, gtl)

    # bf16 rounding can tie several anchors at a gt's rounded max,
    # widening the claim step — a ~1-2% assignment drift is expected
    agree = np.mean(np.asarray(ref.gt_inds) == np.asarray(lo.gt_inds))
    assert agree > 0.97, agree
    assert lo.max_overlaps.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(lo.max_overlaps),
                               np.asarray(ref.max_overlaps),
                               rtol=2e-2, atol=1e-2)
