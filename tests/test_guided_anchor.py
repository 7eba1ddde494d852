"""Guided Anchoring tests."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aidet_tpu.core.points import build_pyramid_points
from aidet_tpu.models import build_detector
from aidet_tpu.models.heads.guided_anchor_head import ga_targets

from test_models_forward import IMG, demo_inputs


def test_ga_targets_center_region():
    pts, sizes, pstrides = build_pyramid_points(128, (8, 16))
    gt = jnp.asarray([[40., 40., 104., 104.]])   # scale 64 → stride-8 lvl
    loc_tgt, loc_w, shape_tgt, pos = ga_targets(
        pts, pstrides, gt, jnp.asarray([True]), jnp.asarray([3]))
    loc = np.asarray(loc_tgt)
    assert loc.sum() > 0
    # positives concentrated near the gt center (72, 72)
    pos_pts = np.asarray(pts)[loc > 0]
    assert (np.abs(pos_pts - 72).max() < 20)
    # shape target = log(scale / (8·stride)): 0 at stride 8, −log 2 at
    # stride 16 (the gt matches both adjacent levels by design)
    st = np.asarray(shape_tgt)[loc > 0]
    assert np.abs(st).max() < 0.75


def test_ga_retina_train_and_infer():
    model = build_detector(dict(
        type="GARetinaNet",
        backbone=dict(type="ResNet", depth=18),
        neck=dict(type="FPN", in_channels=(64, 128, 256, 512),
                  out_channels=64, num_outs=5, start_level=1,
                  add_extra_convs=True),
        bbox_head=dict(type="GARetinaHead", num_classes=16,
                       in_channels=64, feat_channels=64,
                       stacked_convs=1),
        test_cfg=dict(nms_pre=200, max_per_img=20),
        img_size=IMG))
    data = demo_inputs(batch=1)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])
    losses = jax.jit(functools.partial(model.apply, method="loss"))(
        variables, rngs={"sampling": jax.random.PRNGKey(1)}, **data)
    assert {"loss_cls", "loss_bbox", "loss_shape",
            "loss_loc"} == set(losses)
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k
    out = jax.jit(functools.partial(model.apply, method="predict"))(
        variables, data["imgs"], data["img_shapes"])
    assert out["boxes"].shape == (1, 20, 4)
