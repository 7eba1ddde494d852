"""Forward smoke tests with synthetic inputs — the analog of the
reference's tests/test_forward.py (_demo_mm_inputs + per-architecture
train loss / eval inference), on small images for CPU speed."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aidet_tpu.models import build_detector

IMG = 128          # small static size for tests
MAX_GT = 8


def demo_inputs(batch=1, num_gt=3, num_classes=15, seed=0, with_rbox=False,
                with_mask=False, mask_hw=32):
    rng = np.random.RandomState(seed)
    imgs = rng.randn(batch, IMG, IMG, 3).astype(np.float32)
    cx = rng.uniform(20, IMG - 20, (batch, MAX_GT))
    cy = rng.uniform(20, IMG - 20, (batch, MAX_GT))
    w = rng.uniform(8, 40, (batch, MAX_GT))
    h = rng.uniform(8, 40, (batch, MAX_GT))
    boxes = np.stack([np.clip(cx - w / 2, 0, None),
                      np.clip(cy - h / 2, 0, None),
                      np.clip(cx + w / 2, None, IMG - 1),
                      np.clip(cy + h / 2, None, IMG - 1)], -1)
    valid = np.arange(MAX_GT)[None] < num_gt
    labels = rng.randint(1, num_classes + 1, (batch, MAX_GT))
    out = dict(
        imgs=jnp.asarray(imgs),
        gt_boxes=jnp.asarray(boxes.astype(np.float32)),
        gt_valid=jnp.asarray(np.broadcast_to(valid, (batch, MAX_GT))),
        gt_labels=jnp.asarray(labels.astype(np.int32)),
        img_shapes=jnp.asarray(
            np.tile([[IMG, IMG]], (batch, 1)).astype(np.float32)))
    if with_rbox:
        theta = rng.uniform(-1.5, -0.01, (batch, MAX_GT))
        out["gt_rboxes"] = jnp.asarray(np.stack(
            [cx, cy, w, h, theta], -1).astype(np.float32))
    if with_mask:
        masks = (rng.rand(batch, MAX_GT, mask_hw, mask_hw) > 0.5)
        out["gt_masks"] = jnp.asarray(masks.astype(np.float32))
    return out


def _small_cfg(**extra):
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
            rcnn=dict(num_samples=32, mask_size=16)),
        test_cfg=dict(rpn=dict(nms_pre=200, nms_post=100, max_num=100),
                      rcnn=dict(max_per_img=20)),
        img_size=IMG,
    )
    cfg.update(extra)
    return cfg


def _init_and_loss(model, data, rngs_seed=0):
    # jit init/apply: ONE XLA compile per path instead of thousands of
    # eagerly dispatched per-op compiles (minutes vs. hours on CPU)
    variables = jax.jit(model.init)(jax.random.PRNGKey(rngs_seed),
                                    data["imgs"])
    loss_fn = jax.jit(functools.partial(model.apply, method="loss"))
    losses = loss_fn(variables, rngs={"sampling": jax.random.PRNGKey(1)},
                     **data)
    return variables, losses


def _predict(model, variables, data):
    fn = jax.jit(functools.partial(model.apply, method="predict"))
    return fn(variables, data["imgs"], data["img_shapes"])


def test_faster_rcnn_train_and_infer():
    model = build_detector(dict(type="FasterRCNN", **_small_cfg()))
    data = demo_inputs(batch=2)
    variables, losses = _init_and_loss(model, data)
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k
    assert set(losses) == {"loss_rpn_cls", "loss_rpn_bbox", "loss_cls",
                           "loss_bbox"}
    out = _predict(model, variables, data)
    assert out["boxes"].shape == (2, 20, 4)
    assert out["labels"].shape == (2, 20)


def test_faster_rcnn_empty_gt_train():
    model = build_detector(dict(type="FasterRCNN", **_small_cfg()))
    data = demo_inputs(batch=1, num_gt=0)
    _, losses = _init_and_loss(model, data)
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), (k, v)


def test_rbbox_rcnn_theta_train():
    cfg = _small_cfg(
        rbbox_head=dict(type="RBBoxHead", num_classes=16, in_channels=64,
                        fc_out_channels=128, encode="thetaobb"))
    model = build_detector(dict(type="RBBoxRCNN", **cfg))
    data = demo_inputs(batch=1, with_rbox=True)
    variables, losses = _init_and_loss(model, data)
    assert "loss_rbbox" in losses and "loss_rbbox_cls" in losses
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k
    out = _predict(model, variables, data)
    assert out["rboxes"].shape == (1, 20, 5)


@pytest.mark.parametrize("encode,dim", [("pointobb", 8), ("hobb", 5)])
def test_rbbox_rcnn_other_encodings(encode, dim):
    from aidet_tpu.core import rboxes as R
    cfg = _small_cfg(
        rbbox_head=dict(type="RBBoxHead", num_classes=16, in_channels=64,
                        fc_out_channels=128, encode=encode),
        rbbox_encode=encode)
    model = build_detector(dict(type="RBBoxRCNN", **cfg))
    data = demo_inputs(batch=1, with_rbox=True)
    t = data["gt_rboxes"]
    if encode == "pointobb":
        data["gt_rboxes"] = R.thetaobb2pointobb(t)
    else:
        data["gt_rboxes"] = R.thetaobb2hobb(t)
    variables, losses = _init_and_loss(model, data)
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k
    out = _predict(model, variables, data)
    assert out["rboxes"].shape == (1, 20, dim)


def test_faster_rcnn_combined_sampler():
    """Libra recipe: CombinedSampler (instance-balanced pos +
    IoU-balanced neg) dispatches from train_cfg.rcnn.sampler."""
    cfg = _small_cfg(train_cfg=dict(
        rpn_proposal=dict(nms_pre=200, nms_post=100, max_num=100),
        rcnn=dict(num_samples=32, mask_size=16, sampler="combined",
                  floor_thr=-1.0, floor_fraction=0.0, num_bins=3)))
    model = build_detector(dict(type="FasterRCNN", **cfg))
    data = demo_inputs(batch=1)
    variables, losses = _init_and_loss(model, data)
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k


def test_rbbox_rcnn_hobb_robust_loss():
    """hobb_robust_loss takes a per-sample min over the 4 equivalent
    target representations, so with identical params/data its
    loss_rbbox can never exceed the plain hobb loss; everything else
    is untouched."""
    from aidet_tpu.core import rboxes as R
    vals = {}
    for robust in (False, True):
        cfg = _small_cfg(
            rbbox_head=dict(type="RBBoxHead", num_classes=16,
                            in_channels=64, fc_out_channels=128,
                            encode="hobb"),
            rbbox_encode="hobb", hobb_robust_loss=robust)
        model = build_detector(dict(type="RBBoxRCNN", **cfg))
        data = demo_inputs(batch=1, with_rbox=True)
        data["gt_rboxes"] = R.thetaobb2hobb(data["gt_rboxes"])
        variables, losses = _init_and_loss(model, data)
        for k, v in losses.items():
            assert bool(jnp.isfinite(v)), (robust, k)
        vals[robust] = {k: float(v) for k, v in losses.items()}
    assert vals[True]["loss_rbbox"] <= vals[False]["loss_rbbox"] + 1e-5
    for k in vals[False]:
        if k != "loss_rbbox":
            assert abs(vals[True][k] - vals[False][k]) < 1e-4, k


def test_mask_rcnn_train_and_infer():
    cfg = _small_cfg(
        mask_head=dict(type="FCNMaskHead", num_convs=2, in_channels=64,
                       conv_out_channels=64, num_classes=16))
    model = build_detector(dict(type="MaskRCNN", **cfg))
    data = demo_inputs(batch=1, with_mask=True, mask_hw=IMG)
    variables, losses = _init_and_loss(model, data)
    assert "loss_mask" in losses
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k
    out = _predict(model, variables, data)
    assert "masks" in out and out["masks"].shape[:2] == (1, 20)


def test_centermap_obb_train():
    cfg = _small_cfg(
        mask_head=dict(type="CenterMapHead", num_convs=2, in_channels=64,
                       conv_out_channels=64, num_classes=16))
    model = build_detector(dict(type="CenterMapOBB", **cfg))
    data = demo_inputs(batch=1, with_mask=True, mask_hw=IMG)
    # soft centerness targets in [0, 1]
    data["gt_masks"] = data["gt_masks"] * 0.8
    variables, losses = _init_and_loss(model, data)
    assert "loss_mask" in losses
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k


def test_retinanet_train_and_infer():
    model = build_detector(dict(
        type="RetinaNet",
        backbone=dict(type="ResNet", depth=18),
        neck=dict(type="FPN", in_channels=(64, 128, 256, 512),
                  out_channels=64, num_outs=5, start_level=1,
                  add_extra_convs=True),
        bbox_head=dict(type="RetinaHead", num_classes=16, in_channels=64,
                       feat_channels=64, stacked_convs=1, num_anchors=9),
        test_cfg=dict(nms_pre=200, max_per_img=20),
        img_size=IMG))
    data = demo_inputs(batch=1)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])
    losses = jax.jit(functools.partial(model.apply, method="loss"))(
        variables, rngs={"sampling": jax.random.PRNGKey(1)}, **data)
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k
    out = _predict(model, variables, data)
    assert out["boxes"].shape == (1, 20, 4)


def test_rpn_detector():
    from aidet_tpu.models.detectors.rpn import RPN
    model = RPN(backbone=dict(type="ResNet", depth=18),
                neck=dict(type="FPN", in_channels=(64, 128, 256, 512),
                          out_channels=64, num_outs=5),
                rpn_head=dict(type="RPNHead", in_channels=64,
                              feat_channels=64, num_anchors=3),
                test_cfg=dict(nms_pre=200, nms_post=100, max_num=100),
                img_size=IMG)
    data = demo_inputs(batch=1)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])
    losses = jax.jit(functools.partial(model.apply, method="loss"))(
        variables, rngs={"sampling": jax.random.PRNGKey(1)},
        imgs=data["imgs"], gt_boxes=data["gt_boxes"],
        gt_valid=data["gt_valid"], img_shapes=data["img_shapes"])
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k
    out = _predict(model, variables, data)
    assert out["boxes"].shape == (1, 100, 4)


def test_grid_rcnn_train_and_infer():
    cfg = _small_cfg(
        grid_head=dict(type="GridHead", num_convs=2, in_channels=64,
                       point_feat_channels=8, norm_groups=9))
    model = build_detector(dict(type="GridRCNN", **cfg))
    data = demo_inputs(batch=1)
    variables, losses = _init_and_loss(model, data)
    assert "loss_grid" in losses
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k
    out = _predict(model, variables, data)
    assert out["boxes"].shape == (1, 20, 4)
    # grid-refined boxes stay inside the image
    b = np.asarray(out["boxes"])
    assert b.min() >= 0 and b.max() <= IMG - 1


def test_ga_faster_rcnn_train_and_infer():
    cfg = _small_cfg(
        rpn_head=dict(type="GARPNHead", in_channels=64, feat_channels=64))
    model = build_detector(dict(type="GAFasterRCNN", **cfg))
    data = demo_inputs(batch=1)
    variables, losses = _init_and_loss(model, data)
    assert {"loss_rpn_loc", "loss_rpn_shape", "loss_rpn_cls",
            "loss_rpn_bbox"} <= set(losses)
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k
    out = _predict(model, variables, data)
    assert out["boxes"].shape == (1, 20, 4)


def test_faster_rcnn_c4_train_and_infer():
    """C4-style model: no neck, single-level RPN, res5 ResLayer shared
    head before an avg-pool BBoxHead (parity:
    configs/faster_rcnn_r50_caffe_c4_1x.py)."""
    model = build_detector(dict(
        type="FasterRCNN",
        backbone=dict(type="ResNet", depth=18, num_stages=3,
                      out_indices=(2,)),
        neck=dict(type="Identity"),
        shared_head=dict(type="ResLayer", depth=18, stage=3, stride=2),
        rpn_head=dict(type="RPNHead", in_channels=256, feat_channels=64,
                      num_anchors=6),
        bbox_head=dict(type="BBoxHead", with_avg_pool=True,
                       num_classes=16, in_channels=512, roi_feat_size=7),
        strides=(16,),
        anchor_scales=(4, 8),
        train_cfg=dict(
            rpn_proposal=dict(nms_pre=200, nms_post=64, max_num=64),
            rcnn=dict(num_samples=32)),
        test_cfg=dict(rpn=dict(nms_pre=200, nms_post=64, max_num=64),
                      rcnn=dict(max_per_img=20)),
        img_size=IMG))
    data = demo_inputs(batch=2)
    variables, losses = _init_and_loss(model, data)
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k
    assert set(losses) == {"loss_rpn_cls", "loss_rpn_bbox", "loss_cls",
                           "loss_bbox"}
    # the shared res5 stage must own params (layer4 blocks)
    assert any("layer4" in k for k in variables["params"]["_shared_head"])
    out = _predict(model, variables, data)
    assert out["boxes"].shape == (2, 20, 4)
    assert out["labels"].shape == (2, 20)


def test_mask_rcnn_c4_train_and_infer():
    """C4 Mask R-CNN: mask branch rides the res5 shared head
    (parity: configs/mask_rcnn_r50_caffe_c4_1x.py)."""
    model = build_detector(dict(
        type="MaskRCNN",
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
            rcnn=dict(num_samples=32, pos_fraction=0.25)),
        test_cfg=dict(rpn=dict(nms_pre=200, nms_post=64, max_num=64),
                      rcnn=dict(max_per_img=20)),
        img_size=IMG))
    data = demo_inputs(batch=1, with_mask=True)
    variables, losses = _init_and_loss(model, data)
    assert {"loss_cls", "loss_bbox", "loss_mask",
            "loss_rpn_cls"} <= set(losses)
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k
    out = _predict(model, variables, data)
    assert out["boxes"].shape == (1, 20, 4)
    assert out["masks"].shape[-1] == 14


def test_ga_rpn_detector():
    """GA-RPN proposal-only model (parity:
    configs/guided_anchoring/ga_rpn_r50_caffe_fpn_1x.py)."""
    from aidet_tpu.models.detectors.rpn import RPN
    model = RPN(backbone=dict(type="ResNet", depth=18),
                neck=dict(type="FPN", in_channels=(64, 128, 256, 512),
                          out_channels=64, num_outs=5),
                rpn_head=dict(type="GARPNHead", in_channels=64,
                              feat_channels=64),
                test_cfg=dict(rpn=dict(nms_pre=200, nms_post=100,
                                       max_num=100)),
                img_size=IMG)
    data = demo_inputs(batch=1)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])
    losses = jax.jit(functools.partial(model.apply, method="loss"))(
        variables, rngs={"sampling": jax.random.PRNGKey(1)},
        imgs=data["imgs"], gt_boxes=data["gt_boxes"],
        gt_valid=data["gt_valid"], img_shapes=data["img_shapes"])
    assert {"loss_rpn_loc", "loss_rpn_shape", "loss_rpn_cls",
            "loss_rpn_bbox"} == set(losses)
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k
    out = _predict(model, variables, data)
    assert out["boxes"].shape == (1, 100, 4)
