"""Rotated single-stage RetinaNet (theta OBB + rotated NMS) —
BASELINE.json config #2 (round-3 VERDICT item 4)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aidet_tpu.models import build_detector

from test_models_forward import IMG, demo_inputs


def _obb_cfg(encode="thetaobb", reg_dim=5):
    return dict(
        type="RetinaNetOBB",
        backbone=dict(type="ResNet", depth=18),
        neck=dict(type="FPN", in_channels=(64, 128, 256, 512),
                  out_channels=64, num_outs=5, start_level=1,
                  add_extra_convs=True),
        bbox_head=dict(type="RetinaHead", num_classes=16, in_channels=64,
                       feat_channels=64, stacked_convs=1, num_anchors=9,
                       reg_dim=reg_dim),
        rbox_encode=encode,
        test_cfg=dict(nms_pre=200, score_thr=0.05, rnms_thr=0.1,
                      max_per_img=10),
        img_size=IMG)


def test_retinanet_theta_obb_train_and_infer():
    model = build_detector(_obb_cfg())
    data = demo_inputs(batch=2, with_rbox=True)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])
    loss_fn = jax.jit(functools.partial(model.apply, method="loss"))
    losses = loss_fn(variables, rngs={"sampling": jax.random.PRNGKey(1)},
                     **data)
    assert set(losses) == {"loss_cls", "loss_bbox"}
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), (k, v)

    out = jax.jit(functools.partial(model.apply, method="predict"))(
        variables, data["imgs"], data["img_shapes"])
    assert out["rboxes"].shape == (2, 10, 5)
    assert out["boxes"].shape == (2, 10, 4)
    assert np.isfinite(np.asarray(out["rboxes"])).all()
    # invalid slots are zeroed
    v = np.asarray(out["valid"])
    assert (np.asarray(out["rboxes"])[~v] == 0).all()


def test_retinanet_theta_obb_grads_flow():
    model = build_detector(_obb_cfg())
    data = demo_inputs(batch=1, with_rbox=True)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])
    loss_fn = functools.partial(model.apply, method="loss")

    def total(v):
        l = loss_fn(v, rngs={"sampling": jax.random.PRNGKey(1)}, **data)
        return l["loss_cls"] + l["loss_bbox"]
    grads = jax.jit(jax.grad(total))(variables)
    # the rotated reg head must receive gradient through the codec
    reg = grads["params"]["_head"]["retina_reg"]["kernel"]
    assert float(jnp.abs(reg).sum()) > 0
    assert np.isfinite(float(jnp.abs(reg).sum()))


def test_retinanet_obb_reg_dim_mismatch_is_loud():
    cfg = _obb_cfg(reg_dim=4)
    with pytest.raises(ValueError, match="reg_dim"):
        model = build_detector(cfg)
        data = demo_inputs(batch=1, with_rbox=True)
        jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])


def test_retinanet_obb_learns_rotation():
    """A few SGD steps on one fixed scene must drive the rbox loss
    down — the codec/targets/decode chain is trainable end-to-end."""
    import optax

    model = build_detector(_obb_cfg())
    data = demo_inputs(batch=1, num_gt=2, with_rbox=True, seed=7)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    tx = optax.sgd(5e-3, momentum=0.9)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def total(p):
            l = model.apply({"params": p, **rest},
                            rngs={"sampling": jax.random.PRNGKey(1)},
                            method="loss", **data)
            return l["loss_cls"] + l["loss_bbox"], l
        (tot, l), g = jax.value_and_grad(total, has_aux=True)(params)
        upd, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, upd), opt_state, tot

    first = None
    for i in range(8):
        params, opt_state, tot = step(params, opt_state)
        if first is None:
            first = float(tot)
    assert float(tot) < first, (first, float(tot))


def test_rotated_predict_e2e_shapes_memory():
    """Regression for the round-4 RetinaNetOBB e2e crash: the rotated
    multiclass NMS materialized all-pairs polygon-clip scratch with
    trailing (8, 2) micro-dims — f32[8,15,256,256,8,2], which the TPU
    (8, 128) tile layout pads 64x to a 32 GB allocation
    (work_dirs/dota_retinanet_theta_obb_r18_e2e_e2e.log).  The SoA
    rewrite of core/riou.py keeps pair axes trailing and chunks with a
    vmap-proof fori_loop; this test compiles the FULL predict decode at
    the e2e config's exact shapes (512^2, 5 levels, nms_pre=1000,
    15 classes, batch 8) and bounds compiled peak memory.
    """
    from aidet_tpu.models.heads.anchor_head import anchor_head_rboxes

    level_hw = [(64, 64), (32, 32), (16, 16), (8, 8), (4, 4)]
    num_anchors = 9
    level_sizes = tuple(h * w * num_anchors for h, w in level_hw)
    a_tot = sum(level_sizes)
    batch, ncls = 8, 15

    rng = np.random.RandomState(0)
    cls_flat = jnp.asarray(rng.randn(batch, a_tot, ncls), jnp.float32)
    box_flat = jnp.asarray(rng.randn(batch, a_tot, 5) * 0.1, jnp.float32)
    cx = rng.uniform(0, 512, a_tot).astype(np.float32)
    cy = rng.uniform(0, 512, a_tot).astype(np.float32)
    w = rng.uniform(8, 64, a_tot).astype(np.float32)
    h = rng.uniform(8, 64, a_tot).astype(np.float32)
    anchors = jnp.asarray(
        np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1))
    img_shapes = jnp.tile(jnp.asarray([[512.0, 512.0]]), (batch, 1))

    fn = jax.jit(lambda c, b, a, s: anchor_head_rboxes(
        c, b, a, level_sizes, s, encode="thetaobb", nms_pre=1000,
        score_thr=0.05, nms_thr=0.1, max_per_img=100))
    compiled = fn.lower(cls_flat, box_flat, anchors, img_shapes).compile()
    mem = compiled.memory_analysis()
    if mem is not None:  # backend-dependent; present on CPU+TPU jaxlibs
        peak = (mem.temp_size_in_bytes + mem.argument_size_in_bytes
                + mem.output_size_in_bytes)
        assert peak < 4 * 1024 ** 3, f"{peak / 1e9:.2f} GB compiled peak"

    res, rboxes = compiled(cls_flat, box_flat, anchors, img_shapes)
    assert rboxes.shape == (batch, 100, 5)
    assert np.isfinite(np.asarray(res.boxes)).all()
    assert np.isfinite(np.asarray(rboxes)).all()
