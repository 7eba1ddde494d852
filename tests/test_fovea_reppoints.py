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


def test_points2bbox_moment_unit():
    """moment transform: box = mean ± std(ddof=1)·exp(transfer)
    (parity: reppoints_head.py points2bbox, 'moment')."""
    from aidet_tpu.models.heads.reppoints_head import points2bbox_moment
    x = jnp.asarray([[0., 2., 4.]])
    y = jnp.asarray([[1., 1., 4.]])
    mt = jnp.asarray([0.0, 0.0])
    out = np.asarray(points2bbox_moment(x, y, mt, 0.01))
    # mean_x=2, std_x=2 (unbiased); mean_y=2, std_y=sqrt(3)
    np.testing.assert_allclose(
        out, [[0., 2. - np.sqrt(3.), 4., 2. + np.sqrt(3.)]], atol=1e-5)
    # transfer scales the half extents
    out2 = np.asarray(points2bbox_moment(
        x, y, jnp.asarray([np.log(2.0), 0.0]), 0.01))
    np.testing.assert_allclose(out2[0, 2] - out2[0, 0], 8.0, atol=1e-4)


def test_reppoints_moment_train_and_infer():
    """transform_method='moment': learned moment_transfer param exists,
    gets gradient (through moment_mul), losses finite, predict shapes."""
    model = build_detector(dict(
        type="RepPointsDetector",
        backbone=dict(type="ResNet", depth=18),
        neck=_neck_cfg(),
        bbox_head=dict(type="RepPointsHead", num_classes=16,
                       in_channels=64, feat_channels=64,
                       point_feat_channels=64, stacked_convs=1,
                       norm_cfg=dict(type="GN", num_groups=8)),
        transform_method="moment",
        test_cfg=dict(nms_pre=200, max_per_img=20),
        img_size=IMG))
    data = demo_inputs(batch=1)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])
    assert "moment_transfer" in variables["params"]
    losses = jax.jit(functools.partial(model.apply, method="loss"))(
        variables, **data)
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k

    def total(p):
        ls = model.apply({**variables, "params": p},
                         method="loss", **data)
        return sum(jnp.sum(v) for v in ls.values())
    g = jax.jit(jax.grad(total))(variables["params"])
    gmt = np.asarray(g["moment_transfer"])
    assert np.isfinite(gmt).all() and (np.abs(gmt) > 0).any()

    out = jax.jit(functools.partial(model.apply, method="predict"))(
        variables, data["imgs"], data["img_shapes"])
    assert out["boxes"].shape == (1, 20, 4)


def test_reppoints_partial_minmax_train():
    model = build_detector(dict(
        type="RepPointsDetector",
        backbone=dict(type="ResNet", depth=18),
        neck=_neck_cfg(),
        bbox_head=dict(type="RepPointsHead", num_classes=16,
                       in_channels=64, feat_channels=64,
                       point_feat_channels=64, stacked_convs=1),
        transform_method="partial_minmax",
        test_cfg=dict(nms_pre=200, max_per_img=20),
        img_size=IMG))
    data = demo_inputs(batch=1)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])
    losses = jax.jit(functools.partial(model.apply, method="loss"))(
        variables, **data)
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k
