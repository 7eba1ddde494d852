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


def test_cascade_mask_rcnn_predict_masks():
    """Single-mask-head cascade: mask loss on the last stage's samples
    and a mask output at predict time."""
    cfg = _cascade_cfg(
        mask_head=dict(type="FCNMaskHead", num_convs=2, in_channels=64,
                       conv_out_channels=64, num_classes=16))
    model = build_detector(dict(type="CascadeRCNN", **cfg))
    data = demo_inputs(batch=1, with_mask=True, mask_hw=IMG)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])
    losses = jax.jit(functools.partial(model.apply, method="loss"))(
        variables, rngs={"sampling": jax.random.PRNGKey(1)}, **data)
    assert "loss_mask" in losses
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k
    out = jax.jit(functools.partial(model.apply, method="predict"))(
        variables, data["imgs"], data["img_shapes"])
    assert out["masks"].shape == (1, 20, 28, 28)


def test_htc_full():
    """Real HTC (htc.py:13-517): per-stage mask heads with info flow,
    interleaved sampling, semantic branch fused into box+mask feats,
    stage-averaged mask output at test time."""
    import numpy as np
    cfg = _cascade_cfg(
        mask_head=dict(type="HTCMaskHead", num_convs=2, in_channels=64,
                       conv_out_channels=64, num_classes=16),
        semantic_head=dict(type="FusedSemanticHead", num_ins=5,
                           fusion_level=1, in_channels=64,
                           conv_out_channels=64, num_classes=16))
    model = build_detector(dict(type="HTC", **cfg))
    data = demo_inputs(batch=1, with_mask=True, mask_hw=IMG)
    rng = np.random.RandomState(0)
    data["gt_semantic"] = jnp.asarray(
        rng.randint(0, 16, (1, IMG // 4, IMG // 4)).astype(np.int32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])
    losses = jax.jit(functools.partial(model.apply, method="loss"))(
        variables, rngs={"sampling": jax.random.PRNGKey(1)}, **data)
    # one mask loss PER stage + the semantic loss
    assert {"s0.loss_mask", "s1.loss_mask", "s2.loss_mask",
            "loss_semantic_seg"} <= set(losses)
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k
    out = jax.jit(functools.partial(model.apply, method="predict"))(
        variables, data["imgs"], data["img_shapes"])
    assert out["masks"].shape == (1, 20, 28, 28)
    assert bool(jnp.all((out["masks"] >= 0) & (out["masks"] <= 1)))


def test_htc_mask_info_flow_chain():
    """The stage-i mask head must consume the res-feat chain of heads
    0..i-1 (htc_mask_head.py): conv_res params exist for stages >= 1."""
    cfg = _cascade_cfg(
        mask_head=dict(type="HTCMaskHead", num_convs=2, in_channels=64,
                       conv_out_channels=64, num_classes=16))
    model = build_detector(dict(type="HTC", **cfg))
    data = demo_inputs(batch=1, with_mask=True, mask_hw=IMG)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])
    params = variables["params"]
    mask_keys = [k for k in params if k.startswith("_mask_heads_")]
    assert len(mask_keys) == 3
    assert "conv_res" not in params["_mask_heads_0"]
    assert "conv_res" in params["_mask_heads_1"]
    assert "conv_res" in params["_mask_heads_2"]


def test_cascade_rcnn_c4_train_and_infer():
    """C4 cascade: Identity neck, per-stage res5 shared head before an
    avg-pool BBoxHead (parity: configs/cascade_rcnn_r50_caffe_c4_1x.py)."""
    model = build_detector(dict(
        type="CascadeRCNN",
        backbone=dict(type="ResNet", depth=18, num_stages=3,
                      out_indices=(2,)),
        neck=dict(type="Identity"),
        shared_head=dict(type="ResLayer", depth=18, stage=3, stride=2),
        rpn_head=dict(type="RPNHead", in_channels=256, feat_channels=64,
                      num_anchors=6),
        bbox_head=dict(type="BBoxHead", with_avg_pool=True,
                       num_classes=16, in_channels=512, roi_feat_size=7),
        mask_head=dict(type="FCNMaskHead", num_convs=0, in_channels=512,
                       conv_out_channels=64, num_classes=16,
                       upsample_ratio=2),
        strides=(16,),
        anchor_scales=(4, 8),
        train_cfg=dict(
            rpn_proposal=dict(nms_pre=200, nms_post=64, max_num=64),
            rcnn=dict(num_samples=32)),
        test_cfg=dict(rpn=dict(nms_pre=200, nms_post=64, max_num=64),
                      rcnn=dict(max_per_img=20)),
        img_size=IMG))
    data = demo_inputs(batch=1, with_mask=True)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])
    assert "_shared_head" in variables["params"]
    losses = jax.jit(functools.partial(model.apply, method="loss"))(
        variables, rngs={"sampling": jax.random.PRNGKey(1)}, **data)
    assert {"s0.loss_cls", "s2.loss_bbox", "loss_mask",
            "loss_rpn_cls"} <= set(losses)
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k
    out = jax.jit(functools.partial(model.apply, method="predict"))(
        variables, data["imgs"], data["img_shapes"])
    assert out["boxes"].shape == (1, 20, 4)
    # C4 mask head: 14-crop → res5 → 7 → 2x deconv → 14
    assert out["masks"].shape[-1] == 14
