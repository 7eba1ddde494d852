"""Extra augmentation + dataset wrapper tests."""

import numpy as np

from aidet_tpu.data.transforms import (CORRUPTIONS, Expand,
                                       MinIoURandomCrop,
                                       PhotoMetricDistortion, corrupt,
                                       random_rotate90, seg_rescale)
from aidet_tpu.data.voc import ConcatDataset, RepeatDataset


def test_photometric_distortion_shape_dtype():
    img = np.random.RandomState(0).randint(0, 255, (32, 32, 3), np.uint8)
    out = PhotoMetricDistortion(seed=1)(img)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_expand_shifts_boxes():
    img = np.ones((20, 20, 3), np.uint8) * 100
    boxes = np.array([[2., 2., 10., 10.]])
    pts = np.array([[2., 2., 10., 2., 10., 10., 2., 10.]])
    e = Expand(prob=1.0, ratio_range=(2, 2), seed=0)
    img2, boxes2, pts2 = e(img, boxes, pts)
    assert img2.shape[0] == 40
    # box stays on the pasted content
    ox, oy = boxes2[0, 0] - 2, boxes2[0, 1] - 2
    np.testing.assert_allclose(pts2[0][:2], [2 + ox, 2 + oy])


def test_min_iou_random_crop():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (64, 64, 3), np.uint8)
    boxes = np.array([[10., 10., 30., 30.], [40., 40., 60., 60.]])
    labels = np.array([1, 2])
    c = MinIoURandomCrop(seed=3)
    img2, boxes2, labels2 = c(img, boxes, labels)
    assert len(boxes2) == len(labels2) >= 1
    assert (boxes2[:, 2:] >= boxes2[:, :2]).all()


def test_random_rotate90_geometry():
    img = np.zeros((10, 20, 3), np.uint8)
    img[0, 0] = 255  # top-left marker
    pts = np.array([[0., 0., 4., 0., 4., 2., 0., 2.]])
    boxes = np.array([[0., 0., 4., 2.]])
    for k in range(4):
        out, p2, b2, kk = random_rotate90(img, pts, boxes, k=k)
        assert kk == k
        if k == 0:
            continue
        # rotating four times total returns to original shape
        assert out.shape[:2] == ((10, 20) if k == 2 else (20, 10))
        # boxes stay axis-aligned and within bounds
        assert (b2[:, 2] >= b2[:, 0]).all()
        assert b2.min() >= 0
        # quad areas preserved
        def area(q):
            x, y = q[0::2], q[1::2]
            return 0.5 * abs(np.sum(x * np.roll(y, -1)
                                    - np.roll(x, -1) * y))
        np.testing.assert_allclose(area(p2[0]), area(pts[0]), atol=1e-3)


def test_seg_rescale():
    seg = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = seg_rescale(seg, 2.0)
    assert out.shape == (8, 8)
    assert set(np.unique(out)) <= set(np.unique(seg))


def test_corruptions_all_run():
    from aidet_tpu.data.transforms import CORRUPTIONS_ALL
    assert len(CORRUPTIONS) == 15          # the reference benchmark set
    assert len(CORRUPTIONS_ALL) == 19      # + the 4 extras
    img = np.random.RandomState(0).randint(0, 255, (48, 48, 3), np.uint8)
    for name in CORRUPTIONS_ALL:
        for severity in (1, 3, 5):
            out = corrupt(img, name, severity=severity)
            assert out.shape == img.shape and out.dtype == np.uint8
        assert not np.array_equal(out, img), name


def test_corruption_severity_monotone_for_noise():
    """Higher severity must perturb more (sanity on the recipes)."""
    img = np.random.RandomState(1).randint(0, 255, (64, 64, 3), np.uint8)
    for name in ("gaussian_noise", "speckle_noise", "gaussian_blur",
                 "zoom_blur", "elastic_transform"):
        d1 = np.abs(corrupt(img, name, 1).astype(int) - img).mean()
        d5 = np.abs(corrupt(img, name, 5).astype(int) - img).mean()
        assert d5 > d1, (name, d1, d5)


class _FakeDS:
    def __init__(self, n, tag):
        self.n = n
        self.tag = tag
        self.flag = np.zeros(n, np.uint8)
        self.img_infos = [dict(file_name=f"{tag}{i}.png")
                          for i in range(n)]
        self.CLASSES = ("a",)

    def __len__(self):
        return self.n

    def img_path(self, i):
        return f"{self.tag}{i}.png"

    def parse_anns(self, i):
        return dict(idx=i, tag=self.tag)


def test_concat_and_repeat_wrappers():
    c = ConcatDataset([_FakeDS(3, "x"), _FakeDS(2, "y")])
    assert len(c) == 5
    assert c.img_path(0) == "x0.png"
    assert c.img_path(3) == "y0.png"
    assert c.parse_anns(4)["tag"] == "y"

    r = RepeatDataset(_FakeDS(2, "z"), 3)
    assert len(r) == 6
    assert r.img_path(5) == "z1.png"


ALBU_EXAMPLE = [  # the reference albu_example transform list
    dict(type="ShiftScaleRotate", shift_limit=0.0625, scale_limit=0.0,
         rotate_limit=15, interpolation=1, p=1.0),
    dict(type="RandomBrightnessContrast", brightness_limit=(0.1, 0.3),
         contrast_limit=(0.1, 0.3), p=1.0),
    dict(type="ChannelShuffle", p=1.0),
    dict(type="OneOf", transforms=[
        dict(type="Blur", blur_limit=3, p=1.0),
        dict(type="MedianBlur", blur_limit=3, p=1.0)], p=1.0),
]


def test_albu_executes_real_augmentation():
    """The albu stage must actually transform pixels and geometry —
    with the real package when installed, else the vendored numpy
    subset (`data/_vendor_albu.py`). p=1.0 everywhere so the assert is
    deterministic."""
    from aidet_tpu.data.albu import AlbuTransform

    rs = np.random.RandomState(3)
    img = (rs.rand(96, 128, 3) * 255).astype(np.uint8)
    boxes = np.asarray([[20, 20, 60, 50], [70, 40, 120, 90]], np.float32)
    labels = np.asarray([1, 2])
    pobbs = np.asarray([[20, 20, 60, 20, 60, 50, 20, 50],
                        [70, 40, 120, 40, 120, 90, 70, 90]], np.float32)

    tf = AlbuTransform(ALBU_EXAMPLE)
    out_img, out_boxes, out_labels, out_pobbs = tf(
        img, boxes, labels, pobbs)

    assert out_img.shape == img.shape
    assert np.abs(out_img.astype(np.int32)
                  - img.astype(np.int32)).mean() > 1.0  # pixels moved
    assert out_boxes.shape[1] == 4 and len(out_boxes) >= 1
    assert len(out_labels) == len(out_boxes)
    assert out_pobbs is not None and out_pobbs.shape[1] == 8
    # ShiftScaleRotate(rotate 15°) must have moved the geometry
    assert not np.allclose(out_pobbs[: len(pobbs)], pobbs, atol=0.5)
    # boxes stay on-canvas (pascal_voc clip)
    assert (out_boxes[:, [0, 2]] <= 128).all()
    assert (out_boxes[:, [1, 3]] <= 96).all()
    assert (out_boxes >= 0).all()


def test_albu_unknown_transform_is_loud_without_package():
    """Falling back to the vendored subset must stay loud for
    transforms outside it — never degrade to identity (round-1
    InstaBoost lesson)."""
    import importlib.util
    import pytest
    from aidet_tpu.data.albu import AlbuTransform
    if importlib.util.find_spec("albumentations") is not None:
        pytest.skip("albumentations installed; vendored gate N/A")
    with pytest.raises(ImportError, match="vendored"):
        AlbuTransform([dict(type="ElasticTransform", p=0.5)])
