"""MaskOBB detector end-to-end path (BASELINE config #4, round-3
VERDICT item 5): train loss includes the mask branch, and a predict
result routes segm → min-area-rect rbbox → DOTA eval exactly the way
tools/test.py does (parity: reference mmdet/models/detectors/
mask_obb.py:5-31 + mmdet/datasets/dota.py:160-196 segm2txt)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aidet_tpu.core.eval.dota import dota_eval
from aidet_tpu.core.masks import masks_to_thetaobbs
from aidet_tpu.core.rboxes import thetaobb2pointobb
from aidet_tpu.models import build_detector

from test_models_forward import IMG, demo_inputs, _small_cfg


def _mask_obb_model():
    cfg = _small_cfg()
    cfg["mask_head"] = dict(type="FCNMaskHead", num_classes=16,
                            in_channels=64, conv_out_channels=64,
                            num_convs=2)
    return build_detector(dict(type="MaskOBB", **cfg))


def _obb_demo_inputs(batch=2):
    """demo inputs whose gt_masks are the rasterised gt OBBs (the real
    MaskOBB training signal — data/pipeline.py rasterize_polygons)."""
    from aidet_tpu.data.pipeline import rasterize_polygons

    data = demo_inputs(batch=batch, with_rbox=True)
    pobbs = np.asarray(thetaobb2pointobb(data["gt_rboxes"]))
    masks = np.stack([
        rasterize_polygons(pobbs[b], (IMG, IMG), IMG // 4)
        for b in range(batch)])
    data["gt_masks"] = jnp.asarray(masks.astype(np.float32))
    return data


def test_mask_obb_train_loss_and_grads():
    model = _mask_obb_model()
    data = _obb_demo_inputs(batch=2)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])
    losses = jax.jit(functools.partial(model.apply, method="loss"))(
        variables, rngs={"sampling": jax.random.PRNGKey(1)}, **data)
    assert "loss_mask" in losses, sorted(losses)
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), (k, v)

    def total(v):
        l = model.apply(v, rngs={"sampling": jax.random.PRNGKey(1)},
                        method="loss", **data)
        return l["loss_mask"]
    grads = jax.jit(jax.grad(total))(variables)
    g = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()),
        grads["params"]["_mask_head"], 0.0)
    assert g > 0


def test_mask_obb_predict_to_dota_eval():
    """Full segm→rbbox→eval drive: feed the detector's predicted masks
    through masks_to_thetaobbs + thetaobb2pointobb into dota_eval — the
    exact tools/test.py consumption path — and check the plumbing
    produces finite quads and a numeric mAP (an untrained net's mAP is
    meaningless; the assertion is on the contract, not the score)."""
    model = _mask_obb_model()
    data = _obb_demo_inputs(batch=1)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])
    out = jax.jit(functools.partial(model.apply, method="predict"))(
        variables, data["imgs"], data["img_shapes"])
    assert "masks" in out, sorted(out)
    b, k, s, _ = out["masks"].shape
    assert b == 1 and s >= 8

    tobbs = masks_to_thetaobbs(np.asarray(out["masks"][0]),
                               np.asarray(out["boxes"][0]),
                               np.asarray(out["valid"][0]))
    quads = np.asarray(thetaobb2pointobb(jnp.asarray(tobbs)))
    assert np.isfinite(quads).all()
    # non-empty masks must land inside (a small margin of) the canvas
    nz = np.abs(quads).sum(-1) > 0
    if nz.any():
        assert quads[nz].min() > -IMG and quads[nz].max() < 2 * IMG

    gt_quads = np.asarray(thetaobb2pointobb(data["gt_rboxes"][0]))
    gv = np.asarray(data["gt_valid"][0])
    dets = {"scene": dict(
        boxes=quads[nz], scores=np.asarray(out["scores"][0])[nz],
        labels=np.asarray(out["labels"][0])[nz] - 1)}
    gts = {"scene": dict(boxes=gt_quads[gv],
                         labels=np.asarray(data["gt_labels"][0])[gv] - 1)}
    mean_ap, aps = dota_eval(dets, gts, [f"c{i}" for i in range(15)],
                             task="obb")
    assert np.isfinite(mean_ap) and 0.0 <= mean_ap <= 1.0


def test_mask_obb_oracle_masks_round_trip_eval():
    """Oracle check of the same pipeline: perfect mask crops of the gt
    OBBs must score mAP ≈ 1.0 through masks_to_thetaobbs → dota_eval,
    proving the segm→rbbox→eval geometry is lossless (not just
    crash-free)."""
    rs = np.random.RandomState(3)
    n = 6
    tobbs = np.stack([rs.uniform(100, 400, n), rs.uniform(100, 400, n),
                      rs.uniform(60, 120, n), rs.uniform(30, 60, n),
                      rs.uniform(-1.5, -0.05, n)], -1).astype(np.float32)
    quads = np.asarray(thetaobb2pointobb(jnp.asarray(tobbs)))
    labels = rs.randint(0, 15, n)

    # rasterise each gt OBB into its hbb-crop frame (28x28 roi mask)
    import cv2
    s = 28
    crops = np.zeros((n, s, s), np.float32)
    hbbs = np.zeros((n, 4), np.float32)
    for i in range(n):
        q = quads[i].reshape(4, 2)
        x1, y1 = q.min(0) - 2
        x2, y2 = q.max(0) + 2
        hbbs[i] = (x1, y1, x2, y2)
        local = (q - [x1, y1]) / [(x2 - x1 + 1) / s, (y2 - y1 + 1) / s]
        cv2.fillPoly(crops[i], [np.round(local).astype(np.int32)], 1.0)
    rec = masks_to_thetaobbs(crops, hbbs)
    rquads = np.asarray(thetaobb2pointobb(jnp.asarray(rec)))
    dets = {"s": dict(boxes=rquads, scores=np.ones(n, np.float32),
                      labels=labels)}
    gts = {"s": dict(boxes=quads, labels=labels)}
    mean_ap, _ = dota_eval(dets, gts, [f"c{i}" for i in range(15)],
                           task="obb")
    assert mean_ap > 0.95, mean_ap
