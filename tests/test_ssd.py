"""SSD300 anchor scheme + detector smoke tests."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aidet_tpu.models import build_detector
from aidet_tpu.models.heads.ssd_head import build_ssd_anchors


def test_ssd_anchor_counts():
    anchors, sizes = build_ssd_anchors(300)
    # SSD300: (38²·4, 19²·6, 10²·6, 5²·6, 3²·4, 1·4) = 8732
    assert sizes == [38 * 38 * 4, 19 * 19 * 6, 10 * 10 * 6,
                     5 * 5 * 6, 3 * 3 * 4, 4]
    assert anchors.shape == (8732, 4)
    a = np.asarray(anchors)
    w = a[:, 2] - a[:, 0] + 1
    assert (w > 0).all()


def test_ssd_train_and_infer():
    model = build_detector(dict(
        type="SSD",
        backbone=dict(type="SSDVGG", input_size=300),
        bbox_head=dict(type="SSDHead", num_classes=21),
        test_cfg=dict(max_per_img=50),
        input_size=300, img_size=300))
    rng = np.random.RandomState(0)
    g = 4
    cx = rng.uniform(50, 250, (1, g))
    cy = rng.uniform(50, 250, (1, g))
    w = rng.uniform(30, 100, (1, g))
    h = rng.uniform(30, 100, (1, g))
    data = dict(
        imgs=jnp.asarray(rng.randn(1, 300, 300, 3).astype(np.float32)),
        gt_boxes=jnp.asarray(np.stack(
            [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
            -1).astype(np.float32)),
        gt_valid=jnp.ones((1, g), bool),
        gt_labels=jnp.asarray(rng.randint(1, 21, (1, g)).astype(np.int32)),
        img_shapes=jnp.asarray([[300., 300.]]))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])
    losses = jax.jit(functools.partial(model.apply, method="loss"))(
        variables, **data)
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k
    out = jax.jit(functools.partial(model.apply, method="predict"))(
        variables, data["imgs"], data["img_shapes"])
    assert out["boxes"].shape == (1, 50, 4)
