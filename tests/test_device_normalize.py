"""On-device uint8 normalization (models/preprocess.py): the raw-pixel
transfer path must be numerically identical to the host pipeline's
Normalize (reference transforms.py:405-433) for every detector family.
"""

import jax
import jax.numpy as jnp
import numpy as np

from aidet_tpu.data.pipeline import (IMAGENET_MEAN, IMAGENET_STD,
                                     TestPipeline, TrainPipeline,
                                     normalize_image)
from aidet_tpu.models.preprocess import device_normalize


def test_device_normalize_matches_host():
    rs = np.random.RandomState(0)
    img = rs.randint(0, 256, (2, 32, 32, 3), np.uint8)
    host = np.stack([normalize_image(i, IMAGENET_MEAN, IMAGENET_STD,
                                     to_rgb=True) for i in img])
    dev = np.asarray(device_normalize(jnp.asarray(img)))
    np.testing.assert_allclose(dev, host, atol=1e-5)


def test_device_normalize_passthrough_and_custom():
    x = jnp.ones((1, 8, 8, 3), jnp.float32) * 0.5
    assert device_normalize(x) is x        # floats untouched
    img = jnp.full((1, 4, 4, 3), 100, jnp.uint8)
    out = device_normalize(img, dict(mean=(100, 100, 100),
                                     std=(2, 2, 2), to_rgb=False))
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_train_pipeline_uint8_output_and_loss_equivalence():
    rs = np.random.RandomState(1)
    img = rs.randint(0, 256, (64, 64, 3), np.uint8)
    anns = dict(bboxes=np.array([[8., 8., 40., 40.]], np.float32),
                labels=np.array([1], np.int32),
                pointobbs=np.array([[8, 8, 40, 8, 40, 40, 8, 40]],
                                   np.float32))
    kw = dict(img_size=64, max_gt=8, flip_ratio=0.0, seed=3)
    s_dev = TrainPipeline(device_normalize=True, **kw)(img, dict(anns))
    s_host = TrainPipeline(device_normalize=False, **kw)(img, dict(anns))
    assert s_dev["imgs"].dtype == np.uint8
    assert s_host["imgs"].dtype == np.float32
    np.testing.assert_allclose(
        np.asarray(device_normalize(jnp.asarray(s_dev["imgs"]))),
        s_host["imgs"], atol=1e-5)

    from aidet_tpu.models import build_detector
    model = build_detector(
        dict(type="FasterRCNN",
             backbone=dict(type="ResNet", depth=18),
             neck=dict(type="FPN", in_channels=(64, 128, 256, 512),
                       out_channels=32, num_outs=5),
             rpn_head=dict(type="RPNHead", in_channels=32,
                           feat_channels=32, num_anchors=3),
             bbox_head=dict(type="SharedFCBBoxHead", num_classes=4,
                            in_channels=32, fc_out_channels=32),
             img_size=64),
        train_cfg=dict(rpn=dict(num_samples=16),
                       rcnn=dict(num_samples=16)))

    def batchify(s):
        return dict(imgs=jnp.asarray(s["imgs"])[None],
                    gt_boxes=jnp.asarray(s["gt_boxes"])[None],
                    gt_valid=jnp.asarray(s["gt_valid"])[None],
                    gt_labels=jnp.asarray(s["gt_labels"])[None],
                    img_shapes=jnp.asarray(s["img_shapes"])[None])

    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, 64, 64, 3), jnp.float32))

    @jax.jit
    def loss_of(batch):
        return model.apply(variables, method="loss",
                           rngs={"sampling": jax.random.PRNGKey(7)},
                           **batch)

    l_dev = jax.device_get(loss_of(batchify(s_dev)))
    l_host = jax.device_get(loss_of(batchify(s_host)))
    for k in l_host:
        np.testing.assert_allclose(l_dev[k], l_host[k], rtol=1e-4,
                                    atol=1e-5)


def test_mask_targets_uint8_quantization():
    rs = np.random.RandomState(4)
    img = rs.randint(0, 256, (64, 64, 3), np.uint8)
    anns = dict(bboxes=np.array([[8., 8., 40., 40.]], np.float32),
                labels=np.array([1], np.int32),
                pointobbs=np.array([[8, 8, 40, 8, 40, 40, 8, 40]],
                                   np.float32))
    kw = dict(img_size=64, max_gt=4, flip_ratio=0.0, with_mask=True,
              mask_size=32, mask_type="centermap", seed=5)
    s_q = TrainPipeline(device_normalize=True, **kw)(img, dict(anns))
    s_f = TrainPipeline(device_normalize=False, **kw)(img, dict(anns))
    assert s_q["gt_masks"].dtype == np.uint8
    assert s_f["gt_masks"].dtype == np.float32
    # /255 quantization (the reference's own uint8 centermap storage)
    np.testing.assert_allclose(s_q["gt_masks"].astype(np.float32) / 255,
                               s_f["gt_masks"], atol=1 / 254)
    # binary masks quantize exactly
    kw["mask_type"] = "binary"
    b_q = TrainPipeline(device_normalize=True, **kw)(img, dict(anns))
    b_f = TrainPipeline(device_normalize=False, **kw)(img, dict(anns))
    np.testing.assert_array_equal(
        b_q["gt_masks"].astype(np.float32) / 255, b_f["gt_masks"])


def test_test_pipeline_device_normalize():
    rs = np.random.RandomState(2)
    img = rs.randint(0, 256, (40, 64, 3), np.uint8)
    out = TestPipeline(img_size=64, device_normalize=True)(img)
    assert out["imgs"].dtype == np.uint8
    ref = TestPipeline(img_size=64)(img)
    # pad region: rounded-mean uint8 pixels normalize to ~0 but not
    # exactly (|round(mean)-mean|/std < 0.01)
    np.testing.assert_allclose(
        np.asarray(device_normalize(jnp.asarray(out["imgs"]))),
        ref["imgs"], atol=0.01)
    # image region must match to float precision
    np.testing.assert_allclose(
        np.asarray(device_normalize(
            jnp.asarray(out["imgs"])))[:40, :64],
        ref["imgs"][:40, :64], atol=1e-5)
