"""GHM losses + config-selectable soft-NMS (round-3 VERDICT item 5).

Oracle tests port the reference math (mmdet/models/losses/ghm_loss.py)
to numpy; integration tests mount the losses on RetinaNet via the
config hook and round-trip a soft-NMS test_cfg through predict.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aidet_tpu.models.losses import GHMC, GHMR
from aidet_tpu.ops.nms import multiclass_nms, nms_cfg_kwargs

from test_models_forward import IMG, demo_inputs


def _ghmc_oracle(pred, target, weight, bins=10, loss_weight=1.0):
    """numpy twin of reference GHMC.forward (ghm_loss.py:49-94)."""
    edges = np.arange(bins + 1) / bins
    edges[-1] += 1e-6
    g = np.abs(1.0 / (1.0 + np.exp(-pred)) - target)
    valid = weight > 0
    tot = max(valid.sum(), 1.0)
    weights = np.zeros_like(pred)
    n = 0
    for i in range(bins):
        inds = (g >= edges[i]) & (g < edges[i + 1]) & valid
        num_in_bin = inds.sum()
        if num_in_bin > 0:
            weights[inds] = tot / num_in_bin
            n += 1
    if n > 0:
        weights = weights / n
    ce = np.maximum(pred, 0) - pred * target + np.log1p(
        np.exp(-np.abs(pred)))
    return (ce * weights).sum() / tot * loss_weight


def _ghmr_oracle(pred, target, weight, mu=0.02, bins=10, loss_weight=1.0):
    """numpy twin of reference GHMR.forward (ghm_loss.py:126-177)."""
    edges = np.arange(bins + 1) / bins
    edges[-1] = 1e3
    diff = pred - target
    loss = np.sqrt(diff * diff + mu * mu) - mu
    g = np.abs(diff / np.sqrt(mu * mu + diff * diff))
    valid = weight > 0
    tot = max(weight.sum(), 1.0)
    weights = np.zeros_like(g)
    n = 0
    for i in range(bins):
        inds = (g >= edges[i]) & (g < edges[i + 1]) & valid
        num_in_bin = inds.sum()
        if num_in_bin > 0:
            n += 1
            weights[inds] = tot / num_in_bin
    if n > 0:
        weights /= n
    return (loss * weights).sum() / tot * loss_weight


def test_ghmc_matches_reference_math():
    rs = np.random.RandomState(0)
    pred = rs.randn(64, 15).astype(np.float32) * 2
    target = (rs.rand(64, 15) > 0.9).astype(np.float32)
    weight = (rs.rand(64, 15) > 0.2).astype(np.float32)
    got = GHMC(bins=10)(jnp.asarray(pred), jnp.asarray(target),
                        weight=jnp.asarray(weight))
    want = _ghmc_oracle(pred, target, weight)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_ghmc_expands_int_labels():
    """1-based int labels expand to one-hot like _expand_binary_labels."""
    rs = np.random.RandomState(1)
    pred = rs.randn(32, 5).astype(np.float32)
    labels = rs.randint(0, 6, (32,))          # 0 = background
    weight = np.ones(32, np.float32)
    onehot = np.zeros((32, 5), np.float32)
    for i, l in enumerate(labels):
        if l >= 1:
            onehot[i, l - 1] = 1
    got = GHMC()(jnp.asarray(pred), jnp.asarray(labels),
                 weight=jnp.asarray(weight))
    want = _ghmc_oracle(pred, onehot, np.ones_like(pred))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_ghmr_matches_reference_math():
    rs = np.random.RandomState(2)
    pred = rs.randn(128, 4).astype(np.float32)
    target = rs.randn(128, 4).astype(np.float32)
    weight = (rs.rand(128, 4) > 0.3).astype(np.float32)
    got = GHMR(mu=0.02, bins=10, loss_weight=10.0)(
        jnp.asarray(pred), jnp.asarray(target), weight=jnp.asarray(weight))
    want = _ghmr_oracle(pred, target, weight, loss_weight=10.0)
    np.testing.assert_allclose(float(got), want, rtol=1e-4)


def test_ghm_gradients_flow_and_binning_is_detached():
    """Gradients must flow through pred but NOT through the density
    binning (the reference detaches g, ghm_loss.py:73/150)."""
    rs = np.random.RandomState(3)
    pred = jnp.asarray(rs.randn(16, 4).astype(np.float32))
    target = jnp.asarray(rs.randn(16, 4).astype(np.float32))

    g_r = jax.grad(lambda p: GHMR()(p, target))(pred)
    assert np.isfinite(np.asarray(g_r)).all()
    assert float(jnp.abs(g_r).sum()) > 0

    tgt_c = jnp.asarray((rs.rand(16, 4) > 0.8).astype(np.float32))
    g_c = jax.grad(lambda p: GHMC()(p, tgt_c))(pred)
    assert np.isfinite(np.asarray(g_c)).all()
    assert float(jnp.abs(g_c).sum()) > 0


def test_retinanet_ghm_train():
    """GHM losses mount on RetinaNet via the loss_cls/loss_bbox config
    hook (parity: configs/ghm/retinanet_ghm_r50_fpn_1x.py)."""
    from aidet_tpu.models import build_detector

    model = build_detector(dict(
        type="RetinaNet",
        backbone=dict(type="ResNet", depth=18),
        neck=dict(type="FPN", in_channels=(64, 128, 256, 512),
                  out_channels=64, num_outs=5, start_level=1,
                  add_extra_convs=True),
        bbox_head=dict(type="RetinaHead", num_classes=16, in_channels=64,
                       feat_channels=64, stacked_convs=1, num_anchors=9),
        loss_cls=dict(type="GHMC", bins=30, momentum=0.75,
                      use_sigmoid=True, loss_weight=1.0),
        loss_bbox=dict(type="GHMR", mu=0.02, bins=10, momentum=0.7,
                       loss_weight=10.0),
        img_size=IMG))
    data = demo_inputs(batch=1)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])
    loss_fn = jax.jit(functools.partial(model.apply, method="loss"))
    losses = loss_fn(variables, rngs={"sampling": jax.random.PRNGKey(1)},
                     **data)
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), (k, v)

    def total(v):
        return sum(jnp.ravel(x).sum() for x in
                   jax.tree_util.tree_leaves(loss_fn(
                       v, rngs={"sampling": jax.random.PRNGKey(1)},
                       **data)))
    grads = jax.jit(jax.grad(total))(variables)
    gsum = sum(float(jnp.abs(g).sum()) for g in
               jax.tree_util.tree_leaves(grads["params"]))
    assert np.isfinite(gsum) and gsum > 0


def test_multiclass_nms_soft_type():
    """soft_nms decays instead of suppressing: heavy same-class overlap
    survives with a lower score."""
    n, c = 8, 3
    boxes = np.zeros((n, 4), np.float32)
    boxes[0] = [0, 0, 20, 20]
    boxes[1] = [1, 1, 21, 21]     # IoU ~0.83 with box 0
    boxes[2] = [100, 100, 120, 120]
    scores = np.full((n, c + 1), 0.01, np.float32)
    scores[0, 1] = 0.9
    scores[1, 1] = 0.8
    scores[2, 1] = 0.7
    valid = np.zeros(n, bool)
    valid[:3] = True

    hard = multiclass_nms(jnp.asarray(boxes), jnp.asarray(scores),
                          0.05, iou_thr=0.5, max_num=5,
                          valid=jnp.asarray(valid))
    soft = multiclass_nms(jnp.asarray(boxes), jnp.asarray(scores),
                          0.05, iou_thr=0.3, max_num=5,
                          valid=jnp.asarray(valid),
                          nms_type="soft_nms", soft_method="linear",
                          min_score=0.05)
    assert int(hard.valid.sum()) == 2          # box 1 suppressed
    assert int(soft.valid.sum()) == 3          # box 1 kept, decayed
    s = np.asarray(soft.scores)
    decayed = sorted(s[np.asarray(soft.valid)])[0:2]
    assert min(decayed) < 0.7                  # decayed below box 2


def test_nms_cfg_kwargs_parser():
    assert nms_cfg_kwargs(dict(nms_thr=0.7)) == dict(iou_thr=0.7)
    out = nms_cfg_kwargs(dict(nms_thr=0.7,
                              nms=dict(type="soft_nms", iou_thr=0.5,
                                       min_score=0.05)))
    assert out == dict(iou_thr=0.5, nms_type="soft_nms",
                       soft_method="linear", sigma=0.5, min_score=0.05)
    with pytest.raises(ValueError):
        nms_cfg_kwargs(dict(nms=dict(type="matrix_nms")))


def test_faster_rcnn_softnms_predict():
    """A soft-NMS test_cfg round-trips through the two-stage predict
    path (bbox_nms.py:45-47 dispatch parity)."""
    from aidet_tpu.models import build_detector

    from test_models_forward import _small_cfg, demo_inputs

    cfg = _small_cfg()
    cfg["test_cfg"]["rcnn"]["nms"] = dict(type="soft_nms", iou_thr=0.5,
                                          min_score=0.05)
    model = build_detector(dict(type="FasterRCNN", **cfg))
    data = demo_inputs(batch=1)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])
    out = jax.jit(functools.partial(model.apply, method="predict"))(
        variables, data["imgs"], data["img_shapes"])
    assert out["boxes"].shape[1] == 20
    assert np.isfinite(np.asarray(out["boxes"])).all()
