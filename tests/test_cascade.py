"""Cascade R-CNN / HTC forward smoke tests."""

import functools

import jax
import jax.numpy as jnp

from aidet_tpu.models import build_detector

from test_models_forward import IMG, demo_inputs


def _cascade_cfg(**extra):
    cfg = dict(
        backbone=dict(type="ResNet", depth=18),
        neck=dict(type="FPN", in_channels=(64, 128, 256, 512),
                  out_channels=64, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=64, feat_channels=64,
                      num_anchors=3),
        bbox_head=dict(type="SharedFCBBoxHead", num_classes=16,
                       in_channels=64, fc_out_channels=128),
        train_cfg=dict(
            rpn_proposal=dict(nms_pre=200, nms_post=100, max_num=100),
            rcnn=dict(num_samples=32)),
        test_cfg=dict(rpn=dict(nms_pre=200, nms_post=100, max_num=100),
                      rcnn=dict(max_per_img=20)),
        img_size=IMG)
    cfg.update(extra)
    return cfg


def test_cascade_rcnn_train_and_infer():
    model = build_detector(dict(type="CascadeRCNN", **_cascade_cfg()))
    data = demo_inputs(batch=1)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])
    losses = jax.jit(functools.partial(model.apply, method="loss"))(
        variables, rngs={"sampling": jax.random.PRNGKey(1)}, **data)
    # three stages of cls+bbox + rpn
    assert {"s0.loss_cls", "s1.loss_cls", "s2.loss_cls",
            "s0.loss_bbox", "loss_rpn_cls"} <= set(losses)
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k
    out = jax.jit(functools.partial(model.apply, method="predict"))(
        variables, data["imgs"], data["img_shapes"])
    assert out["boxes"].shape == (1, 20, 4)


def test_htc_with_mask_branch():
    cfg = _cascade_cfg(
        mask_head=dict(type="FCNMaskHead", num_convs=2, in_channels=64,
                       conv_out_channels=64, num_classes=16))
    model = build_detector(dict(type="HTC", **cfg))
    data = demo_inputs(batch=1, with_mask=True, mask_hw=IMG)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])
    losses = jax.jit(functools.partial(model.apply, method="loss"))(
        variables, rngs={"sampling": jax.random.PRNGKey(1)}, **data)
    assert "loss_mask" in losses
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k
