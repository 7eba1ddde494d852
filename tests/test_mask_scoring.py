"""Mask Scoring R-CNN + DoubleHead smoke tests."""

import functools

import jax
import jax.numpy as jnp

from aidet_tpu.models import build_detector

from test_models_forward import IMG, demo_inputs, _small_cfg


def test_mask_scoring_rcnn():
    cfg = _small_cfg(
        mask_head=dict(type="FCNMaskHead", num_convs=2, in_channels=64,
                       conv_out_channels=64, num_classes=16),
        mask_iou_head=dict(type="MaskIoUHead", num_convs=2, num_fcs=1,
                           in_channels=64, conv_out_channels=64,
                           fc_out_channels=128, num_classes=16))
    model = build_detector(dict(type="MaskScoringRCNN", **cfg))
    data = demo_inputs(batch=1, with_mask=True, mask_hw=IMG)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])
    losses = jax.jit(functools.partial(model.apply, method="loss"))(
        variables, rngs={"sampling": jax.random.PRNGKey(1)}, **data)
    assert "loss_mask_iou" in losses
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k
    out = jax.jit(functools.partial(model.apply, method="predict"))(
        variables, data["imgs"], data["img_shapes"])
    assert "mask_scores" in out
    assert bool(jnp.isfinite(out["mask_scores"]).all())


def test_double_head_rcnn():
    cfg = _small_cfg(
        bbox_head=dict(type="DoubleConvFCBBoxHead", num_classes=16,
                       in_channels=64, num_convs=1, num_fcs=1,
                       conv_out_channels=64, fc_out_channels=128))
    model = build_detector(dict(type="DoubleHeadRCNN", **cfg))
    data = demo_inputs(batch=1)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])
    losses = jax.jit(functools.partial(model.apply, method="loss"))(
        variables, rngs={"sampling": jax.random.PRNGKey(1)}, **data)
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k
