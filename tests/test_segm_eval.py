"""Mask-mAP evaluation (core/eval/segm.py) vs hand-checked scenarios."""

import numpy as np

from aidet_tpu.core.eval.segm import (eval_segm, mask_iou_matrix,
                                      mask_record, polygon_record)


def _rect_poly(x1, y1, x2, y2):
    return [x1, y1, x2, y1, x2, y2, x1, y2]


def test_mask_iou_identical_and_disjoint():
    hw = (100, 100)
    a = polygon_record(_rect_poly(10, 10, 50, 50), hw)
    b = polygon_record(_rect_poly(10, 10, 50, 50), hw)
    c = polygon_record(_rect_poly(60, 60, 90, 90), hw)
    m = mask_iou_matrix([a], [b, c])
    assert m[0, 0] > 0.99 and m[0, 1] == 0.0


def test_mask_iou_half_overlap():
    hw = (100, 100)
    a = polygon_record(_rect_poly(0, 0, 40, 20), hw)
    b = polygon_record(_rect_poly(20, 0, 60, 20), hw)
    m = mask_iou_matrix([a], [b])
    # inter = 20x20, union = 2*800 - 400 = 1200 → 1/3
    np.testing.assert_allclose(m[0, 0], 1 / 3, atol=0.05)


def test_mask_record_matches_polygon():
    """A full-box soft crop pasted into `box` == the box polygon."""
    hw = (64, 64)
    crop = np.ones((28, 28), np.float32)
    rec_pred = mask_record([8, 8, 31, 31], crop, hw)
    rec_gt = polygon_record(_rect_poly(8, 8, 32, 32), hw)
    m = mask_iou_matrix([rec_pred], [rec_gt])
    assert m[0, 0] > 0.9


def test_eval_segm_perfect_and_miss():
    hw = (64, 64)
    gt_rec = [polygon_record(_rect_poly(4, 4, 30, 30), hw),
              polygon_record(_rect_poly(34, 34, 60, 60), hw)]
    gts = [dict(records=gt_rec, labels=np.asarray([0, 1]))]
    # perfect prediction for class 0; class 1 predicted in the wrong
    # place → AP(class0)=1, AP(class1)=0 at IoU .5
    preds = [dict(
        records=[polygon_record(_rect_poly(4, 4, 30, 30), hw),
                 polygon_record(_rect_poly(0, 0, 10, 10), hw)],
        scores=np.asarray([0.9, 0.8], np.float32),
        labels=np.asarray([0, 1]))]
    mean, by_thr = eval_segm(preds, gts, num_classes=2, iou_thrs=[0.5])
    m50, aps = by_thr[0.5]
    assert aps[0] > 0.99 and aps[1] == 0.0
    np.testing.assert_allclose(m50, 0.5, atol=1e-6)


def test_coco_dataset_segm_metric(tmp_path):
    """CocoDataset.evaluate reports segm_* when results carry masks."""
    import json

    from aidet_tpu.data.coco import CocoDataset

    ann = dict(
        images=[dict(id=1, file_name="a.png", width=64, height=64)],
        annotations=[dict(
            id=1, image_id=1, category_id=1, iscrowd=0,
            bbox=[8, 8, 24, 24], area=576,
            segmentation=[_rect_poly(8, 8, 32, 32)])],
        categories=[dict(id=1, name="thing")])
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(ann))
    ds = CocoDataset(ann_file=str(p))
    ds.CLASSES = ("thing",)
    results = [dict(
        boxes=np.asarray([[8, 8, 32, 32]], np.float32),
        scores=np.asarray([0.9], np.float32),
        labels=np.asarray([0]),
        valid=np.asarray([True]),
        masks=np.ones((1, 28, 28), np.float32))]
    out = ds.evaluate(results)
    assert out["segm_AP50"] > 0.99
    assert out["AP50"] > 0.99


def test_polygon_record_multi_part():
    """COCO multi-part segmentations rasterise ALL parts."""
    hw = (100, 100)
    multi = [ _rect_poly(0, 0, 20, 20), _rect_poly(40, 0, 60, 20) ]
    rec = polygon_record(multi, hw)
    (x1, y1, x2, y2), m, area = rec
    assert (x1, y1, x2, y2) == (0, 0, 61, 21)
    np.testing.assert_allclose(area, 2 * 21 * 21, rtol=0.05)


def test_eval_segm_crowd_ignore():
    """A detection matching only a crowd region is neither TP nor FP."""
    hw = (64, 64)
    gts = [dict(records=[polygon_record(_rect_poly(4, 4, 20, 20), hw)],
                labels=np.asarray([0]),
                ignore_records=[polygon_record(
                    _rect_poly(30, 30, 60, 60), hw)])]
    preds = [dict(
        records=[polygon_record(_rect_poly(4, 4, 20, 20), hw),
                 polygon_record(_rect_poly(30, 30, 60, 60), hw)],
        scores=np.asarray([0.9, 0.8], np.float32),
        labels=np.asarray([0, 0]))]
    mean, by_thr = eval_segm(preds, gts, num_classes=1, iou_thrs=[0.5])
    # the crowd-matched det must not drag precision below 1
    assert by_thr[0.5][0] > 0.99
