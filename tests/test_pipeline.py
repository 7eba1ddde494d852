"""Data pipeline tests: transforms, centermap synthesis, loader."""

import json
import os

import numpy as np
import pytest

from aidet_tpu.data.centermap import (generate_centerness_image,
                                      pointobb2pseudomask,
                                      pointobbs2centermap)
from aidet_tpu.data.pipeline import (TestPipeline, TrainPipeline,
                                     collate_batch, normalize_image,
                                     rasterize_polygons, resize_keep_ratio)


def _fake_anns(n=3, img=256, seed=0):
    rng = np.random.RandomState(seed)
    cx, cy = rng.uniform(60, img - 60, (2, n))
    w, h = rng.uniform(20, 50, (2, n))
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                     -1).astype(np.float32)
    th = rng.uniform(-1.4, -0.1, n)
    pts = []
    for i in range(n):
        c, s = np.cos(th[i]), np.sin(th[i])
        d = np.array([[-w[i] / 2, -h[i] / 2], [w[i] / 2, -h[i] / 2],
                      [w[i] / 2, h[i] / 2], [-w[i] / 2, h[i] / 2]])
        R = np.array([[c, -s], [s, c]])
        pts.append((d @ R.T + [cx[i], cy[i]]).reshape(-1))
    return dict(bboxes=boxes,
                labels=rng.randint(1, 16, n).astype(np.int32),
                pointobbs=np.asarray(pts, np.float32),
                bboxes_ignore=np.zeros((0, 4), np.float32),
                segmentations=[None] * n)


def test_resize_keep_ratio():
    img = np.zeros((200, 400, 3), np.uint8)
    out, scale = resize_keep_ratio(img, 100)
    assert out.shape[:2] == (50, 100)
    assert abs(scale - 0.25) < 1e-6


def test_normalize_roundtrip_stats():
    img = (np.ones((8, 8, 3)) * [103.53, 116.28, 123.675]).astype(np.uint8)
    out = normalize_image(img)  # BGR→RGB then standardize
    assert np.abs(out).max() < 0.1


def test_train_pipeline_shapes_and_padding():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (256, 256, 3), np.uint8)
    pipe = TrainPipeline(img_size=128, max_gt=8, flip_ratio=0.0,
                         with_rbox=True, with_mask=True, mask_type="binary")
    s = pipe(img, _fake_anns())
    assert s["imgs"].shape == (128, 128, 3)
    assert s["gt_boxes"].shape == (8, 4)
    assert s["gt_valid"].sum() == 3
    assert s["gt_rboxes"].shape == (8, 5)
    assert s["gt_masks"].shape[0] == 8
    # boxes scaled by 0.5
    assert s["gt_boxes"][:3].max() <= 128


def test_train_pipeline_flip_consistency():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (128, 128, 3), np.uint8)
    pipe = TrainPipeline(img_size=128, max_gt=8, flip_ratio=1.0,
                         with_rbox=True)
    anns = _fake_anns(img=128, seed=1)
    s = pipe(img, anns)
    # flipped hbb must still be inside the image and ordered
    b = s["gt_boxes"][:3]
    assert (b[:, 2] >= b[:, 0]).all() and (b[:, 0] >= -1).all()
    # rbox centers mirrored
    np.testing.assert_allclose(
        s["gt_rboxes"][:3, 0],
        128 - 1 - (anns["bboxes"][:, 0] + anns["bboxes"][:, 2]) / 2,
        atol=2.0)


def test_test_pipeline():
    img = np.zeros((200, 300, 3), np.uint8)
    pipe = TestPipeline(img_size=128)
    s = pipe(img)
    assert s["imgs"].shape == (128, 128, 3)
    assert abs(float(s["scale_factors"]) - 128 / 300) < 1e-6


def test_collate_batch():
    pipe = TestPipeline(img_size=64)
    samples = [pipe(np.zeros((64, 64, 3), np.uint8)) for _ in range(3)]
    batch = collate_batch(samples)
    assert batch["imgs"].shape == (3, 64, 64, 3)


def test_train_pipeline_ignore_only_patch_collates():
    # A patch whose every annotation fell in the ignore set carries no
    # 'pointobbs' key at all (prepare_dota keeps it when bboxes_ignore
    # is non-empty); the rbox pipeline must still emit the zero
    # gt_rboxes slot or collate_batch KeyErrors on a mixed batch.
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (128, 128, 3), np.uint8)
    pipe = TrainPipeline(img_size=128, max_gt=8, flip_ratio=0.0,
                         with_rbox=True)
    empty = dict(bboxes=np.zeros((0, 4), np.float32),
                 labels=np.zeros((0,), np.int32),
                 bboxes_ignore=np.asarray([[10, 10, 40, 40]], np.float32),
                 segmentations=[])
    s_empty = pipe(img, empty)
    assert s_empty["gt_rboxes"].shape == (8, 5)
    assert not s_empty["gt_valid"].any()
    s_full = pipe(img, _fake_anns(img=128, seed=2))
    batch = collate_batch([s_empty, s_full])
    assert batch["gt_rboxes"].shape == (2, 8, 5)


def test_centerness_template():
    t = generate_centerness_image(64)
    assert t.shape == (64, 64)
    assert t.max() <= 1.0 and t.min() >= 0.0
    # peak in the middle, zero at the corner
    assert t[32, 32] > 0.95
    assert t[0, 0] < 1e-6


def test_pseudomask_peak_at_obb_center():
    quad = np.array([40., 20., 80., 40., 70., 60., 30., 40.])
    m = pointobb2pseudomask(quad, (100, 100))
    cy, cx = np.unravel_index(np.argmax(m), m.shape)
    # center of the quad ≈ (55, 40)
    assert abs(cx - 55) < 6 and abs(cy - 40) < 6
    # outside the quad → 0
    assert m[90, 90] == 0.0


def test_pseudomask_batch_and_scaling():
    quads = np.array([[10., 10., 50., 10., 50., 30., 10., 30.],
                      [60., 60., 90., 60., 90., 90., 60., 90.]])
    out = pointobbs2centermap(quads, (100, 100), mask_size=50)
    assert out.shape == (2, 50, 50)
    assert out[0].max() > 0.9
    # first instance occupies the upper-left quadrant at half scale
    assert out[0][:20, 5:25].max() > 0.5
    assert out[0][30:, 30:].max() == 0.0


def test_rasterize_polygons():
    quads = np.array([[0., 0., 50., 0., 50., 50., 0., 50.]])
    m = rasterize_polygons(quads, (100, 100), 50)
    assert m.shape == (1, 50, 50)
    assert m[0][:24, :24].mean() > 0.9
    assert m[0][30:, 30:].mean() < 0.05


def test_centerness_rate_threshold():
    t = generate_centerness_image(65, factor=4.0, rate=0.5)
    assert t.max() == 1.0  # odd size: centre pixel hits exactly 1
    # thresholded: everything below rate clamped to exactly 0
    assert np.all((t == 0) | (t >= 0.5))
    t0 = generate_centerness_image(64, factor=4.0, rate=0.0)
    assert (t0 > 0).sum() > (t > 0).sum()


def test_mask_weight_synthesis():
    """with_mask_weight → (1-centerness) per-instance maps in [0,1]
    (loading.py:119-128)."""
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (256, 256, 3), np.uint8)
    pipe = TrainPipeline(img_size=128, max_gt=8, flip_ratio=0.0,
                         with_rbox=True, with_mask=True,
                         mask_type="centermap", with_mask_weight=True)
    s = pipe(img, _fake_anns())
    mw = s["gt_mask_weights"]
    assert mw.shape == s["gt_masks"].shape
    assert mw.min() >= 0.0 and mw.max() <= 1.0
    # weight template is the inverse of centerness: at each instance's
    # OBB centre the weight is low while the target is high
    m = s["gt_masks"]
    for i in range(3):
        cy, cx = np.unravel_index(np.argmax(m[i]), m[i].shape)
        assert m[i, cy, cx] > 0.9
        assert mw[i, cy, cx] < 0.3
    # reverse variant: centerness itself (high at centre)
    pipe_r = TrainPipeline(img_size=128, max_gt=8, flip_ratio=0.0,
                           with_rbox=True, with_mask=True,
                           mask_type="centermap",
                           with_reverse_mask_weight=True)
    s_r = pipe_r(img, _fake_anns())
    mr = s_r["gt_mask_weights"]
    for i in range(3):
        cy, cx = np.unravel_index(np.argmax(m[i]), m[i].shape)
        assert mr[i, cy, cx] > 0.7


def test_pseudo_segmentation_and_heatmap_weight():
    """with_semantic paints class labels into quads; padding is 255;
    with_heatmap_weight peaks near instance centres."""
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (200, 256, 3), np.uint8)  # non-square
    anns = _fake_anns()
    pipe = TrainPipeline(img_size=128, max_gt=8, flip_ratio=0.0,
                         with_rbox=True, with_semantic=True,
                         with_heatmap_weight=True)
    s = pipe(img, anns)
    seg = s["gt_semantic"]
    hw = s["gt_seg_weights"]
    assert seg.shape == (32, 32) and hw.shape == (32, 32)
    # image is 200x256 → resized to 100x128 → seg rows beyond 100/4=25
    # are ignore
    assert np.all(seg[26:] == 255)
    assert np.all(seg[:25, :32] != 255)
    # painted labels are a subset of {0} ∪ gt labels
    inside = seg[seg != 255]
    assert set(np.unique(inside)) <= set([0] + list(anns["labels"]))
    assert (inside > 0).sum() > 0
    assert hw.min() >= 0.0 and hw.max() <= 1.0
    assert hw.max() > 0.8  # peaks near centres


def test_centermap_net_trains_from_pipeline_targets():
    """End-to-end: the pipeline's synthesised CenterMap-Net targets
    (masks, mask weights, pseudo-seg, heatmap weight) feed the model's
    loss — the configuration of the best baseline rows
    (configs/dota/centermap_net_tgrs_mask_weight_V4.py)."""
    import functools
    import jax
    import jax.numpy as jnp
    from aidet_tpu.models import build_detector

    IMG = 128
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (256, 256, 3), np.uint8)
    pipe = TrainPipeline(img_size=IMG, max_gt=8, flip_ratio=0.0,
                         with_rbox=False, with_mask=True,
                         mask_type="centermap", with_mask_weight=True,
                         with_semantic=True, with_heatmap_weight=True)
    batch = collate_batch([pipe(img, _fake_anns(seed=s))
                           for s in range(2)])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    model = build_detector(dict(
        type="CenterMapNet",
        backbone=dict(type="ResNet", depth=18),
        neck=dict(type="FPN", in_channels=(64, 128, 256, 512),
                  out_channels=64, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=64, feat_channels=64,
                      num_anchors=3),
        bbox_head=dict(type="SharedFCBBoxHead", num_classes=16,
                       in_channels=64, fc_out_channels=128),
        mask_head=dict(type="CenterMapHead", num_convs=2, in_channels=64,
                       conv_out_channels=64, num_classes=16),
        semantic_head=dict(type="WPSGAHead", in_channels=64, channels=64,
                           num_classes=16),
        semantic_fusion="add",
        train_cfg=dict(
            rpn_proposal=dict(nms_pre=200, nms_post=100, max_num=100),
            rcnn=dict(num_samples=32)),
        test_cfg=dict(rpn=dict(nms_pre=200, nms_post=100, max_num=100),
                      rcnn=dict(max_per_img=10)),
        img_size=IMG))
    import jax.random as jr
    variables = jax.jit(model.init)(jr.PRNGKey(0), batch["imgs"])
    losses = jax.jit(functools.partial(model.apply, method="loss"))(
        variables, rngs={"sampling": jr.PRNGKey(1)}, **batch)
    assert "loss_seg" in losses and "loss_mask" in losses
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), (k, v)


def test_train_pipeline_rotate90_keeps_geometry():
    """rotate90_ratio=1.0: boxes stay consistent with the rotated
    image content (reference RandomRotate, the '_rotation' configs)."""
    img = np.zeros((128, 128, 3), np.uint8)
    img[10:40, 20:80] = 255  # one bright block
    anns = dict(bboxes=np.asarray([[20, 10, 79, 39]], np.float32),
                labels=np.asarray([1], np.int32),
                pointobbs=np.asarray(
                    [[20, 10, 79, 10, 79, 39, 20, 39]], np.float32),
                bboxes_ignore=np.zeros((0, 4), np.float32),
                segmentations=[None])
    pipe = TrainPipeline(img_size=128, max_gt=4, flip_ratio=0.0,
                         rotate90_ratio=1.0, with_rbox=True, seed=3)
    s = pipe(img, anns)
    assert s["gt_valid"].sum() == 1
    x0, y0, x1, y1 = s["gt_boxes"][0]
    # the bright region (positive after normalisation; background is
    # negative) must sit inside the box
    ys, xs = np.nonzero(s["imgs"].sum(-1) > 0)
    if len(xs):  # rotation may be k=0 depending on seed; geometry must match
        assert x0 - 1 <= xs.min() and xs.max() <= x1 + 1
        assert y0 - 1 <= ys.min() and ys.max() <= y1 + 1


def test_coco_dataset_exclude_small(tmp_path):
    """min_area / max_small_length filtering (reference dota.py:47-48,
    the exclude_small config)."""
    import json

    from aidet_tpu.data.coco import CocoDataset
    ann = dict(
        images=[dict(id=1, file_name="a.png", width=128, height=128)],
        annotations=[
            dict(id=1, image_id=1, category_id=1, iscrowd=0,
                 bbox=[4, 4, 8, 8], area=64),       # small: filtered
            dict(id=2, image_id=1, category_id=1, iscrowd=0,
                 bbox=[20, 20, 40, 40], area=1600),  # kept
        ],
        categories=[dict(id=1, name="thing")])
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(ann))
    ds = CocoDataset(ann_file=str(p), min_area=80, max_small_length=12,
                     filter_empty=False)
    out = ds.parse_anns(0)
    assert len(out["bboxes"]) == 1
    assert out["bboxes"][0][0] == 20
    # without the filter both survive
    ds2 = CocoDataset(ann_file=str(p), filter_empty=False)
    assert len(ds2.parse_anns(0)["bboxes"]) == 2


def test_grouped_loader_shard_uniform_and_single_group():
    """Sharded loaders must expose IDENTICAL batch counts (a host with
    one extra batch deadlocks the per-step psum), and shuffled batches
    must be single-aspect-group (GroupSampler parity)."""
    from aidet_tpu.data.loader import GroupedLoader

    class DS:
        def __init__(self, n, flags):
            self.n = n
            self.flag = np.asarray(flags, np.uint8)
            self.img_infos = [dict(height=8, width=8)] * n

        def __len__(self):
            return self.n

        def img_path(self, i):
            return "/nonexistent.png"

        def parse_anns(self, i):
            return dict(bboxes=np.zeros((0, 4), np.float32),
                        labels=np.zeros(0, np.int32),
                        bboxes_ignore=np.zeros((0, 4), np.float32))

    # 1007 samples, 2 groups, 2 shards, batch 2: counts must match
    ds = DS(1007, [0] * 500 + [1] * 507)
    pipe = lambda img, anns: dict(imgs=np.zeros((4, 4, 3), np.float32))
    loaders = [GroupedLoader(ds, pipe, 2, seed=3, num_shards=2,
                             shard_id=s) for s in (0, 1)]
    assert len(loaders[0]) == len(loaders[1])
    # every chunk is single-group
    for ld in loaders:
        for chunk in ld._chunks():
            groups = set(ds.flag[chunk].tolist())
            assert len(groups) == 1, chunk
    # union of both shards covers every index at least once
    seen = set()
    for ld in loaders:
        for chunk in ld._chunks():
            seen.update(chunk.tolist())
    assert len(seen) == 1007


def test_np_rboxes_parity():
    """The host pipeline's numpy geometry (data/np_rboxes.py) must stay
    in lock-step with the on-device jax originals (core/rboxes.py) —
    the loader path must never dispatch jax ops (3 s/batch over the
    tunnel, round-4 post-mortem)."""
    import jax.numpy as jnp

    from aidet_tpu.core import rboxes as R
    from aidet_tpu.data import np_rboxes as NR

    rng = np.random.RandomState(7)
    theta = np.stack([rng.uniform(100, 900, 64),
                      rng.uniform(100, 900, 64),
                      rng.uniform(8, 120, 64),
                      rng.uniform(8, 120, 64),
                      rng.uniform(-np.pi / 2, -1e-3, 64)],
                     -1).astype(np.float32)
    p = np.asarray(R.thetaobb2pointobb(jnp.asarray(theta)))

    for name in ("pointobb2bbox", "pointobb_best_point_sort",
                 "pointobb2thetaobb", "pointobb2hobb"):
        got = getattr(NR, name)(p)
        want = np.asarray(getattr(R, name)(jnp.asarray(p)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2,
                                   err_msg=name)
    got = NR.pointobb_flip(p, (1024, 1024))
    want = np.asarray(R.pointobb_flip(jnp.asarray(p), (1024, 1024)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)


def test_pipeline_host_path_has_no_jax(monkeypatch):
    """TrainPipeline.__call__ on a rbox sample must complete without
    importing/dispatching jax (regression guard for the host-bound
    train loop)."""
    import builtins
    import sys

    from aidet_tpu.data.pipeline import TrainPipeline

    pipe = TrainPipeline(img_size=64, max_gt=8, flip_ratio=1.0,
                         with_rbox=True, rbox_encode="thetaobb")
    img = np.random.RandomState(0).randint(
        0, 255, (64, 64, 3), np.uint8)
    quad = np.array([[10, 10, 30, 12, 28, 25, 8, 23]], np.float32)
    anns = dict(bboxes=np.array([[8, 10, 30, 25]], np.float32),
                labels=np.array([1], np.int32),
                pointobbs=quad)

    real_import = builtins.__import__

    def guarded(name, *a, **k):
        if name == "jax" or name.startswith("jax."):
            raise AssertionError("host pipeline imported jax")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", guarded)
    out = pipe(img, anns)
    assert out["gt_rboxes"].shape == (8, 5)
    assert out["gt_valid"][0]
