"""ATSS assignment + detector tests."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aidet_tpu.core.anchors import build_pyramid_anchors
from aidet_tpu.core.atss import atss_assign
from aidet_tpu.models import build_detector

from test_models_forward import IMG, demo_inputs


def test_atss_assign_basic():
    anchors, sizes = build_pyramid_anchors(
        128, (8, 16, 32), base_sizes=(64, 128, 256),
        scales=(1.0,), ratios=(1.0,))
    gt = jnp.asarray([[20., 20., 80., 80.]])
    assigned, labels = atss_assign(anchors, sizes, gt,
                                   jnp.asarray([True]),
                                   jnp.asarray([7]), topk=9)
    a = np.asarray(assigned)
    assert (a > 0).sum() > 0                     # someone claimed it
    assert set(np.asarray(labels)[a > 0]) == {7}
    # anchors far from the gt stay background
    ax = np.asarray((anchors[:, 0] + anchors[:, 2]) / 2)
    ay = np.asarray((anchors[:, 1] + anchors[:, 3]) / 2)
    far = (ax > 110) | (ay > 110)
    assert (a[far] == 0).all()


def test_atss_assign_empty_gt():
    anchors, sizes = build_pyramid_anchors(
        64, (8, 16), base_sizes=(64, 128), scales=(1.0,), ratios=(1.0,))
    assigned, labels = atss_assign(
        anchors, sizes, jnp.zeros((2, 4)), jnp.zeros(2, bool),
        jnp.zeros(2, jnp.int32))
    assert (np.asarray(assigned) == 0).all()


def test_atss_train_and_infer():
    model = build_detector(dict(
        type="ATSS",
        backbone=dict(type="ResNet", depth=18),
        neck=dict(type="FPN", in_channels=(64, 128, 256, 512),
                  out_channels=64, num_outs=5, start_level=1,
                  add_extra_convs=True, extra_convs_on_inputs=False),
        bbox_head=dict(type="ATSSHead", num_classes=16, in_channels=64,
                       feat_channels=64, stacked_convs=1),
        test_cfg=dict(nms_pre=200, max_per_img=20),
        img_size=IMG))
    data = demo_inputs(batch=1)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])
    losses = jax.jit(functools.partial(model.apply, method="loss"))(
        variables, **data)
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k
    assert set(losses) == {"loss_cls", "loss_bbox", "loss_centerness"}
    out = jax.jit(functools.partial(model.apply, method="predict"))(
        variables, data["imgs"], data["img_shapes"])
    assert out["boxes"].shape == (1, 20, 4)
