"""Evaluation tests: AP oracles, recall, DOTA merge + eval."""

import numpy as np

from aidet_tpu.core.eval import average_precision, eval_map, eval_recalls
from aidet_tpu.core.eval.dota import dota_eval
from aidet_tpu.core.eval.mean_ap import tpfp_default, bbox_overlaps_np
from aidet_tpu.data.tiling import (device_tiler,
                                   merge_patch_detections, tile_coords,
                                   tile_image)
from aidet_tpu.data.dota import DOTADataset, parse_patch_name


def test_average_precision_perfect():
    rec = np.linspace(0.1, 1.0, 10)
    prec = np.ones(10)
    assert average_precision(rec, prec, "area") == 1.0
    assert abs(average_precision(rec, prec, "11points") - 1.0) < 1e-6


def test_average_precision_known_value():
    # single det, recall 0.5 at precision 1.0
    rec = np.array([0.5])
    prec = np.array([1.0])
    assert abs(average_precision(rec, prec, "area") - 0.5) < 1e-6
    # 11-point: points 0.0-0.5 see precision 1 → 6/11
    assert abs(average_precision(rec, prec, "11points") - 6 / 11) < 1e-6


def test_tpfp_matching():
    gt = np.array([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32)
    det = np.array([[0, 0, 10, 10, 0.9],       # tp
                    [1, 1, 11, 11, 0.8],       # dup → fp
                    [100, 100, 110, 110, 0.7]  # fp
                    ], np.float32)
    tp, fp = tpfp_default(det, gt, np.zeros((0, 4)), 0.5)
    np.testing.assert_array_equal(tp, [1, 0, 0])
    np.testing.assert_array_equal(fp, [0, 1, 1])


def test_eval_map_perfect_detections():
    gt = dict(boxes=np.array([[0, 0, 10, 10], [30, 30, 50, 50]],
                             np.float32),
              labels=np.array([1, 2]))
    det = [
        [np.array([[0, 0, 10, 10, 0.9]], np.float32),   # class 1
         np.array([[30, 30, 50, 50, 0.8]], np.float32)]  # class 2
    ]
    mAP, per_cls = eval_map(det, [gt], num_classes=2)
    assert abs(mAP - 1.0) < 1e-6


def test_eval_recalls():
    gts = [np.array([[0, 0, 10, 10]], np.float32)]
    props = [np.array([[0, 0, 10, 10, 0.9], [50, 50, 60, 60, 0.8]],
                      np.float32)]
    r = eval_recalls(gts, props, proposal_nums=(1, 2), iou_thrs=(0.5,))
    np.testing.assert_allclose(r, [[1.0], [1.0]])


def test_tile_coords_cover_scene():
    coords = tile_coords(2200, 3000, patch=1024, overlap=200)
    xs = {x for x, y in coords}
    ys = {y for x, y in coords}
    assert max(xs) + 1024 >= 3000 and max(ys) + 1024 >= 2200
    assert min(xs) == 0 and min(ys) == 0


def test_tile_image_shapes():
    img = np.arange(300 * 400 * 3, dtype=np.uint8).reshape(300, 400, 3)
    patches, offs = tile_image(img, patch=256, overlap=64)
    assert patches.shape[1:] == (256, 256, 3)
    assert len(patches) == len(offs)
    # patch content matches source
    x, y = int(offs[0][0]), int(offs[0][1])
    np.testing.assert_array_equal(patches[0][:100, :100],
                                  img[y:y + 100, x:x + 100])


def test_device_tiler_matches_host_tiling():
    # the serving path's on-device tiler must produce byte-identical
    # patches (and identical offsets) to the host tile_image path
    rs = np.random.RandomState(3)
    img = rs.randint(0, 256, (700, 900, 3), np.uint8)
    host_patches, host_offs = tile_image(img, patch=512, overlap=100)
    tiler, offs = device_tiler(700, 900, patch=512, overlap=100)
    np.testing.assert_array_equal(offs, host_offs)
    dev_patches = np.asarray(tiler(img))
    np.testing.assert_array_equal(dev_patches, host_patches)


def test_merge_patch_detections_dedups_overlap():
    # same physical object seen in two overlapping patches
    quad = np.array([100., 100., 140., 100., 140., 120., 100., 120.])
    det1 = dict(boxes=quad[None], scores=np.array([0.9]),
                labels=np.array([0]), valid=np.array([True]))
    quad2 = quad - np.tile([512., 0.], 4)  # same obj in patch at x=512
    det2 = dict(boxes=quad2[None], scores=np.array([0.8]),
                labels=np.array([0]), valid=np.array([True]))
    merged = merge_patch_detections(
        [det1, det2], np.array([[0., 0.], [512., 0.]]), num_classes=1,
        iou_thr=0.3)
    assert len(merged["scores"]) == 1
    assert merged["scores"][0] == 0.9


def test_parse_patch_name():
    assert parse_patch_name("P0001__1__0___512.png") == \
        ("P0001", 0.0, 512.0, 1.0)
    assert parse_patch_name("P0706__0.5__1024___2048") == \
        ("P0706", 1024.0, 2048.0, 0.5)
    assert parse_patch_name("plainname.png") == ("plainname", 0.0, 0.0, 1.0)


def test_dota_eval_perfect_obb():
    quad = np.array([[10., 10., 50., 10., 50., 30., 10., 30.]])
    gts = {"P1": dict(boxes=quad, labels=np.array([0]))}
    dets = {"P1": dict(boxes=quad, scores=np.array([0.9]),
                       labels=np.array([0]))}
    mAP, aps = dota_eval(dets, gts, ("harbor",), task="obb")
    assert abs(mAP - 1.0) < 1e-6


def test_dota_eval_miss_is_zero():
    quad = np.array([[10., 10., 50., 10., 50., 30., 10., 30.]])
    far = quad + 500
    gts = {"P1": dict(boxes=quad, labels=np.array([0]))}
    dets = {"P1": dict(boxes=far, scores=np.array([0.9]),
                       labels=np.array([0]))}
    mAP, _ = dota_eval(dets, gts, ("harbor",), task="obb")
    assert mAP == 0.0


def test_eval_map_class_agnostic_ignore():
    """ignore regions without ignore_labels count for every class (the
    VOC 'difficult' convention) instead of crashing."""
    from aidet_tpu.core.eval.mean_ap import eval_map
    det = [[np.array([[10, 10, 50, 30, 0.9], [200, 200, 240, 230, 0.8]],
                     np.float32)]]
    gts = [dict(boxes=np.array([[10., 10., 50., 30.]]),
                labels=np.array([1]),
                ignore=np.array([[200., 200., 240., 230.]]))]
    mAP, res = eval_map(det, gts, num_classes=1)
    assert abs(mAP - 1.0) < 1e-6           # ignored det is neither tp nor fp


def test_dota_eval_int_difficult_and_orphan_scene():
    """int difficulty columns coerce to bool (no fancy-index corruption)
    and detections in scenes absent from the gt count as FP."""
    quad = np.array([[10., 10., 50., 10., 50., 30., 10., 30.]])
    gts = {"P1": dict(boxes=np.concatenate([quad, quad + 100]),
                      labels=np.array([0, 0]),
                      difficult=np.array([0, 1]))}   # ints, not bools
    dets = {"P1": dict(boxes=quad, scores=np.array([0.9]),
                       labels=np.array([0]))}
    mAP, _ = dota_eval(dets, gts, ("harbor",), task="obb")
    assert abs(mAP - 1.0) < 1e-6   # easy gt matched; hard gt is neutral

    # orphan-scene detections must register as false positives
    dets2 = {"P1": dict(boxes=quad, scores=np.array([0.9]),
                        labels=np.array([0])),
             "P_orphan": dict(boxes=quad, scores=np.array([0.95]),
                              labels=np.array([0]))}
    mAP2, _ = dota_eval(dets2, gts, ("harbor",), task="obb")
    assert mAP2 < 1.0 - 1e-6, mAP2


def test_merge_parallel_matches_serial():
    """The multiprocessing per-class merge (reference parity:
    mergebypoly_mp, datasets/dota.py:310-336) must produce decisions
    identical to the serial path."""
    rng = np.random.RandomState(3)
    n_patch, k = 4, 120
    dets, offs = [], []
    for i in range(n_patch):
        cx = rng.uniform(100, 900, k).astype(np.float32)
        cy = rng.uniform(100, 900, k).astype(np.float32)
        w = rng.uniform(20, 80, k).astype(np.float32)
        h = rng.uniform(20, 80, k).astype(np.float32)
        quads = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy - h / 2,
                          cx + w / 2, cy + h / 2, cx - w / 2, cy + h / 2],
                         -1)
        dets.append(dict(boxes=quads,
                         scores=rng.rand(k).astype(np.float32),
                         labels=rng.randint(0, 4, k).astype(np.int32),
                         valid=np.ones(k, bool)))
        offs.append((824 * (i % 2), 824 * (i // 2)))
    offs = np.asarray(offs, np.float32)

    serial = merge_patch_detections(dets, offs, num_classes=4, workers=0)
    par = merge_patch_detections(dets, offs, num_classes=4, workers=3)
    np.testing.assert_array_equal(serial["labels"], par["labels"])
    np.testing.assert_allclose(serial["boxes"], par["boxes"])
    np.testing.assert_allclose(serial["scores"], par["scores"])
