"""FreeAnchor + RetinaSepBN tests.

Parity targets: mmdet/models/anchor_heads/free_anchor_retina_head.py
(bag likelihood) and retina_sepbn_head.py (shared convs, per-level
norms)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aidet_tpu.models import build_detector
from aidet_tpu.models.heads.free_anchor import free_anchor_loss

from test_models_forward import IMG, demo_inputs


def _anchors(n=64):
    rng = np.random.RandomState(0)
    cx = rng.uniform(10, IMG - 10, n)
    cy = rng.uniform(10, IMG - 10, n)
    s = rng.uniform(8, 40, n)
    return jnp.asarray(np.stack(
        [cx - s / 2, cy - s / 2, cx + s / 2, cy + s / 2], -1)
        .astype(np.float32))


def test_free_anchor_loss_basics():
    """Finite; positive bags anchored on real gts; empty image gives
    zero positive loss."""
    anchors = _anchors()
    rng = np.random.RandomState(1)
    b, a, c, g = 2, 64, 5, 4
    cls = jnp.asarray(rng.randn(b, a, c).astype(np.float32))
    reg = jnp.asarray(0.1 * rng.randn(b, a, 4).astype(np.float32))
    gt = jnp.asarray(np.tile(np.asarray(
        [[10, 10, 40, 40], [50, 50, 90, 90], [20, 60, 60, 100],
         [70, 10, 110, 50]], np.float32), (b, 1, 1)))
    gv = jnp.asarray(np.ones((b, g), bool))
    gl = jnp.asarray(rng.randint(1, c + 1, (b, g)).astype(np.int32))
    out = jax.jit(functools.partial(
        free_anchor_loss, num_classes=c, pre_anchor_topk=8))(
        cls, reg, anchors, gt, gv, gl)
    assert set(out) == {"positive_bag_loss", "negative_bag_loss"}
    for v in out.values():
        assert bool(jnp.isfinite(v)) and float(v) >= 0

    # invalid gts contribute nothing to the positive term
    out_empty = jax.jit(functools.partial(
        free_anchor_loss, num_classes=c, pre_anchor_topk=8))(
        cls, reg, anchors, gt, jnp.zeros((b, g), bool), gl)
    assert float(out_empty["positive_bag_loss"]) == 0.0


def test_free_anchor_perfect_predictions_lower_loss():
    """Confident correct predictions must yield a smaller bag loss than
    random ones."""
    anchors = _anchors()
    c, g = 5, 2
    gt = jnp.asarray(np.asarray(
        [[[10, 10, 40, 40], [60, 60, 100, 100]]], np.float32))
    gv = jnp.ones((1, g), bool)
    gl = jnp.asarray(np.asarray([[1, 2]], np.int32))

    # anchors 0/1 exactly on the gts
    anchors = anchors.at[0].set(jnp.asarray([10., 10., 40., 40.]))
    anchors = anchors.at[1].set(jnp.asarray([60., 60., 100., 100.]))
    cls_good = jnp.full((1, 64, c), -8.0)
    cls_good = cls_good.at[0, 0, 0].set(8.0).at[0, 1, 1].set(8.0)
    reg0 = jnp.zeros((1, 64, 4))
    loss_fn = jax.jit(functools.partial(
        free_anchor_loss, num_classes=c, pre_anchor_topk=4))
    good = loss_fn(cls_good, reg0, anchors, gt, gv, gl)
    bad = loss_fn(jnp.zeros((1, 64, c)), reg0, anchors, gt, gv, gl)
    tot_g = sum(good.values())
    tot_b = sum(bad.values())
    assert float(tot_g) < float(tot_b)


def test_free_anchor_retinanet_end_to_end():
    model = build_detector(dict(
        type="FreeAnchorRetinaNet",
        backbone=dict(type="ResNet", depth=18),
        neck=dict(type="FPN", in_channels=(64, 128, 256, 512),
                  out_channels=64, num_outs=5, start_level=1,
                  add_extra_convs=True),
        bbox_head=dict(type="RetinaHead", num_classes=16, in_channels=64,
                       feat_channels=64, stacked_convs=1, num_anchors=9),
        free_anchor_cfg=dict(pre_anchor_topk=8),
        test_cfg=dict(nms_pre=200, max_per_img=10),
        img_size=IMG))
    data = demo_inputs(batch=1)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])
    losses = jax.jit(functools.partial(model.apply, method="loss"))(
        variables, rngs={"sampling": jax.random.PRNGKey(1)}, **data)
    assert set(losses) == {"positive_bag_loss", "negative_bag_loss"}
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k
    out = jax.jit(functools.partial(model.apply, method="predict"))(
        variables, data["imgs"], data["img_shapes"])
    assert out["boxes"].shape == (1, 10, 4)


def test_retina_sepbn_head():
    """Shared conv weights across levels, separate per-level norm
    params (retina_sepbn_head.py:42-76)."""
    from aidet_tpu.models.heads import RetinaSepBNHead
    head = RetinaSepBNHead(num_classes=16, num_ins=5, in_channels=64,
                           feat_channels=64, stacked_convs=2,
                           num_anchors=9)
    feats = tuple(jnp.ones((1, IMG // s, IMG // s, 64))
                  for s in (8, 16, 32, 64, 128))
    v = jax.jit(head.init)(jax.random.PRNGKey(0), feats)
    cls_out, reg_out = jax.jit(head.apply)(v, feats)
    assert len(cls_out) == 5
    assert cls_out[0].shape == (1, IMG // 8, IMG // 8, 9 * 15)
    assert reg_out[2].shape == (1, IMG // 32, IMG // 32, 36)
    p = v["params"]
    # ONE shared conv stack ...
    assert "cls_conv0" in p and "cls_conv1" in p
    # ... but per-level norm affine pairs
    for lvl in range(5):
        assert f"cls_bn_l{lvl}_0_scale" in p
        assert f"reg_bn_l{lvl}_1_bias" in p


def test_retina_sepbn_detector():
    model = build_detector(dict(
        type="RetinaNet",
        backbone=dict(type="ResNet", depth=18),
        neck=dict(type="FPN", in_channels=(64, 128, 256, 512),
                  out_channels=64, num_outs=5, start_level=1,
                  add_extra_convs=True),
        bbox_head=dict(type="RetinaSepBNHead", num_classes=16, num_ins=5,
                       in_channels=64, feat_channels=64, stacked_convs=1,
                       num_anchors=9),
        test_cfg=dict(nms_pre=200, max_per_img=10),
        img_size=IMG))
    data = demo_inputs(batch=1)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])
    losses = jax.jit(functools.partial(model.apply, method="loss"))(
        variables, rngs={"sampling": jax.random.PRNGKey(1)}, **data)
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k
