"""Semantic branch tests: heads, loss, CenterMapNet fusion."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aidet_tpu.models import build_detector
from aidet_tpu.models.heads.semantic_head import (FusedSemanticHead,
                                                  WPSGAHead, semantic_loss)

from test_models_forward import IMG, demo_inputs


def _feats(c=64):
    return tuple(jnp.ones((1, IMG // s, IMG // s, c))
                 for s in (4, 8, 16, 32, 64))


def test_fused_semantic_head_shapes():
    head = FusedSemanticHead(num_ins=5, fusion_level=1, in_channels=64,
                             conv_out_channels=64, num_classes=16)
    f = _feats()
    v = jax.jit(head.init)(jax.random.PRNGKey(0), f)
    logits, emb = jax.jit(head.apply)(v, f)
    assert logits.shape == (1, IMG // 8, IMG // 8, 16)
    assert emb.shape == (1, IMG // 8, IMG // 8, 64)


def test_wpsga_head_shapes():
    head = WPSGAHead(in_channels=64, channels=64, num_levels=4,
                     num_classes=16)
    f = _feats()
    v = jax.jit(head.init)(jax.random.PRNGKey(0), f)
    logits, emb = jax.jit(head.apply)(v, f)
    assert logits.shape == (1, IMG // 4, IMG // 4, 16)
    assert emb.shape == (1, IMG // 4, IMG // 4, 64)


def test_semantic_loss_and_ignore():
    logits = jnp.zeros((1, 16, 16, 4))
    gt = np.ones((1, 32, 32), np.int32)
    gt[0, :8] = 255  # ignore strip
    loss = semantic_loss(logits, jnp.asarray(gt))
    assert bool(jnp.isfinite(loss))
    # perfect logits → near-zero loss
    perfect = jnp.full((1, 16, 16, 4), -20.0).at[..., 1].set(20.0)
    loss_p = semantic_loss(perfect, jnp.asarray(gt))
    assert float(loss_p) < 1e-3


def test_centermap_net_train():
    cfg = dict(
        backbone=dict(type="ResNet", depth=18),
        neck=dict(type="FPN", in_channels=(64, 128, 256, 512),
                  out_channels=64, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=64, feat_channels=64,
                      num_anchors=3),
        bbox_head=dict(type="SharedFCBBoxHead", num_classes=16,
                       in_channels=64, fc_out_channels=128),
        mask_head=dict(type="CenterMapHead", num_convs=2, in_channels=64,
                       conv_out_channels=64, num_classes=16),
        semantic_head=dict(type="WPSGAHead", in_channels=64, channels=64,
                           num_classes=16),
        semantic_fusion="add",
        train_cfg=dict(
            rpn_proposal=dict(nms_pre=200, nms_post=100, max_num=100),
            rcnn=dict(num_samples=32)),
        test_cfg=dict(rpn=dict(nms_pre=200, nms_post=100, max_num=100),
                      rcnn=dict(max_per_img=10)),
        img_size=IMG)
    model = build_detector(dict(type="CenterMapNet", **cfg))
    data = demo_inputs(batch=1, with_mask=True, mask_hw=IMG)
    data["gt_masks"] = data["gt_masks"] * 0.7
    rng = np.random.RandomState(0)
    data["gt_semantic"] = jnp.asarray(
        rng.randint(0, 16, (1, IMG, IMG)).astype(np.int32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])
    losses = jax.jit(functools.partial(model.apply, method="loss"))(
        variables, rngs={"sampling": jax.random.PRNGKey(1)}, **data)
    assert "loss_seg" in losses and "loss_mask" in losses
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k
    out = jax.jit(functools.partial(model.apply, method="predict"))(
        variables, data["imgs"], data["img_shapes"])
    assert "masks" in out
