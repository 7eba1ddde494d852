"""OHEM sampling + Fast R-CNN path tests (parity: the reference's
test_faster_rcnn_ohem_forward and FastRCNN)."""

import functools

import jax
import jax.numpy as jnp

from aidet_tpu.models import build_detector

from test_models_forward import IMG, demo_inputs, _small_cfg


def test_faster_rcnn_ohem_train():
    cfg = _small_cfg()
    cfg["train_cfg"]["rcnn"]["sampler"] = "ohem"
    model = build_detector(dict(type="FasterRCNN", **cfg))
    data = demo_inputs(batch=1)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])
    losses = jax.jit(functools.partial(model.apply, method="loss"))(
        variables, rngs={"sampling": jax.random.PRNGKey(1)}, **data)
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k


def test_fast_rcnn_from_proposals():
    model = build_detector(dict(type="FastRCNN", **_small_cfg()))
    data = demo_inputs(batch=1)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])
    # precomputed proposals: use the padded gt boxes
    props = data["gt_boxes"]
    valid = data["gt_valid"]
    out = jax.jit(functools.partial(
        model.apply, method="predict_from_proposals"))(
        variables, data["imgs"], props, valid, data["img_shapes"])
    assert out["boxes"].shape == (1, 20, 4)
    assert bool(jnp.isfinite(out["scores"]).all())
