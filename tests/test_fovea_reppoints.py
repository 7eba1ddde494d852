"""FoveaBox + RepPoints smoke tests."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aidet_tpu.models import build_detector
from aidet_tpu.models.heads.reppoints_head import points2bbox_minmax

from test_models_forward import IMG, demo_inputs


def _neck_cfg():
    return dict(type="FPN", in_channels=(64, 128, 256, 512),
                out_channels=64, num_outs=5, start_level=1,
                add_extra_convs=True, extra_convs_on_inputs=False)


def test_points2bbox_minmax():
    pts = jnp.asarray([[1., 5., 3., 2., -1., 7.]])
    out = np.asarray(points2bbox_minmax(pts))
    np.testing.assert_allclose(out, [[-1., 2., 3., 7.]])


def test_fovea_train_and_infer():
    model = build_detector(dict(
        type="FOVEA",
        backbone=dict(type="ResNet", depth=18),
        neck=_neck_cfg(),
        bbox_head=dict(type="FoveaHead", num_classes=16, in_channels=64,
                       feat_channels=64, stacked_convs=1),
        test_cfg=dict(nms_pre=200, max_per_img=20),
        img_size=IMG))
    data = demo_inputs(batch=1)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])
    losses = jax.jit(functools.partial(model.apply, method="loss"))(
        variables, **data)
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k
    out = jax.jit(functools.partial(model.apply, method="predict"))(
        variables, data["imgs"], data["img_shapes"])
    assert out["boxes"].shape == (1, 20, 4)


def test_reppoints_train_and_infer():
    model = build_detector(dict(
        type="RepPointsDetector",
        backbone=dict(type="ResNet", depth=18),
        neck=_neck_cfg(),
        bbox_head=dict(type="RepPointsHead", num_classes=16,
                       in_channels=64, feat_channels=64,
                       point_feat_channels=64, stacked_convs=1),
        test_cfg=dict(nms_pre=200, max_per_img=20),
        img_size=IMG))
    data = demo_inputs(batch=1)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])
    losses = jax.jit(functools.partial(model.apply, method="loss"))(
        variables, **data)
    assert {"loss_cls", "loss_pts_init", "loss_pts_refine"} == set(losses)
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k
    out = jax.jit(functools.partial(model.apply, method="predict"))(
        variables, data["imgs"], data["img_shapes"])
    assert out["boxes"].shape == (1, 20, 4)
