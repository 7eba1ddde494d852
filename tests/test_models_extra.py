"""Forward smoke tests for the extended model zoo: ResNeXt, HRNet,
SSDVGG backbones; HRFPN/BFP necks; FCOS detector."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aidet_tpu.models import build_detector
from aidet_tpu.models.backbones import HRNet, ResNeXt, SSDVGG
from aidet_tpu.models.necks import BFP, HRFPN

IMG = 128


def test_resnext_forward():
    m = ResNeXt(depth=50, groups=8, base_width=4)
    x = jnp.zeros((1, IMG, IMG, 3))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    outs = jax.jit(m.apply)(v, x)
    assert len(outs) == 4
    assert outs[0].shape == (1, IMG // 4, IMG // 4, 256)
    assert outs[3].shape == (1, IMG // 32, IMG // 32, 2048)


def test_hrnet_forward_and_hrfpn():
    m = HRNet(width=16, stage_modules=(1, 1, 1, 1), stage_blocks=2)
    x = jnp.zeros((1, IMG, IMG, 3))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    outs = jax.jit(m.apply)(v, x)
    assert len(outs) == 4
    assert outs[0].shape == (1, IMG // 4, IMG // 4, 16)
    assert outs[3].shape == (1, IMG // 32, IMG // 32, 128)

    neck = HRFPN(in_channels=(16, 32, 64, 128), out_channels=32,
                 num_outs=5)
    nv = jax.jit(neck.init)(jax.random.PRNGKey(1), outs)
    feats = jax.jit(neck.apply)(nv, outs)
    assert len(feats) == 5
    assert feats[0].shape == (1, IMG // 4, IMG // 4, 32)
    assert feats[4].shape == (1, IMG // 64, IMG // 64, 32)


def test_ssd_vgg_forward():
    m = SSDVGG(input_size=300)
    x = jnp.zeros((1, 300, 300, 3))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    outs = jax.jit(m.apply)(v, x)
    assert len(outs) == 6
    assert outs[0].shape[-1] == 512       # conv4_3 (L2Norm'd)
    assert outs[1].shape[-1] == 1024      # fc7


def test_bfp_preserves_shapes():
    feats = tuple(jnp.ones((1, IMG // s, IMG // s, 32))
                  for s in (4, 8, 16, 32, 64))
    neck = BFP(in_channels=32, num_levels=5)
    v = jax.jit(neck.init)(jax.random.PRNGKey(0), feats)
    outs = jax.jit(neck.apply)(v, feats)
    for a, b in zip(feats, outs):
        assert a.shape == b.shape


def _fcos_data(batch=1, num_gt=3, seed=0):
    rng = np.random.RandomState(seed)
    g = 8
    cx = rng.uniform(20, IMG - 20, (batch, g))
    cy = rng.uniform(20, IMG - 20, (batch, g))
    w = rng.uniform(10, 40, (batch, g))
    h = rng.uniform(10, 40, (batch, g))
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                     -1).astype(np.float32)
    return dict(
        imgs=jnp.asarray(rng.randn(batch, IMG, IMG, 3).astype(np.float32)),
        gt_boxes=jnp.asarray(boxes),
        gt_valid=jnp.asarray(np.arange(g)[None] < num_gt).repeat(batch, 0),
        gt_labels=jnp.asarray(rng.randint(1, 16, (batch, g)).astype(
            np.int32)),
        img_shapes=jnp.asarray(np.tile([[IMG, IMG]], (batch, 1)).astype(
            np.float32)))


def test_fcos_train_and_infer():
    model = build_detector(dict(
        type="FCOS",
        backbone=dict(type="ResNet", depth=18),
        neck=dict(type="FPN", in_channels=(64, 128, 256, 512),
                  out_channels=64, num_outs=5, start_level=1,
                  add_extra_convs=True, extra_convs_on_inputs=False,
                  relu_before_extra_convs=True),
        bbox_head=dict(type="FCOSHead", num_classes=16, in_channels=64,
                       feat_channels=64, stacked_convs=1),
        test_cfg=dict(nms_pre=200, max_per_img=20),
        img_size=IMG))
    data = _fcos_data()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])
    losses = jax.jit(functools.partial(model.apply, method="loss"))(
        variables, **data)
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k
    assert set(losses) == {"loss_cls", "loss_bbox", "loss_centerness"}
    out = jax.jit(functools.partial(model.apply, method="predict"))(
        variables, data["imgs"], data["img_shapes"])
    assert out["boxes"].shape == (1, 20, 4)


def test_fcos_target_unit():
    from aidet_tpu.core.points import fcos_target
    pts = jnp.asarray([[16., 16.], [100., 100.]])
    rr = jnp.asarray([[-1., 1e8], [-1., 1e8]])
    gt = jnp.asarray([[0., 0., 32., 32.]])
    labels, tgts, ctr = fcos_target(pts, rr, gt,
                                    jnp.asarray([True]),
                                    jnp.asarray([5]))
    assert int(labels[0]) == 5 and int(labels[1]) == 0
    np.testing.assert_allclose(np.asarray(tgts[0]), [16., 16., 16., 16.])
    assert float(ctr[0]) > 0.99
    assert float(ctr[1]) == 0.0


def test_resnet_dcn_stages_forward_and_grad():
    """dcn/stage_with_dcn wiring (configs/dcn family): DCN replaces
    the 3x3 in the requested stages, output shapes unchanged, grads
    flow to the offset convs."""
    import jax
    import jax.numpy as jnp
    from aidet_tpu.models.backbones.resnet import ResNet

    m = ResNet(depth=50, dcn=dict(modulated=True),
               stage_with_dcn=(False, True, True, True),
               frozen_stages=-1)
    x = jnp.ones((1, 64, 64, 3))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    import flax
    flat = flax.traverse_util.flatten_dict(v["params"])
    off_keys = [k for k in flat if "offset" in "/".join(k)]
    assert off_keys, "no DCN offset convs created"
    assert not any(k[0].startswith("layer1") and "offset" in "/".join(k)
                   for k in flat)
    outs = jax.jit(m.apply)(v, x)
    assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]

    def loss(p):
        return sum(o.sum() for o in m.apply(
            {**v, "params": p}, x))
    g = jax.grad(loss)(v["params"])
    gflat = flax.traverse_util.flatten_dict(g)
    total = sum(float(jnp.abs(gflat[k]).sum()) for k in off_keys)
    import numpy as np
    assert np.isfinite(total)


def test_hrnet_w18_hrfpn_forward():
    """HRNet-W18 + HRFPN channel wiring (faster_rcnn_hrnetv2p_w18)."""
    import jax
    import jax.numpy as jnp
    from aidet_tpu.models.backbones.hrnet import HRNet
    from aidet_tpu.models.necks.hrfpn import HRFPN

    bb = HRNet(width=18, stage_modules=(1, 1, 1, 1))
    x = jnp.ones((1, 64, 64, 3))
    v = jax.jit(bb.init)(jax.random.PRNGKey(0), x)
    feats = jax.jit(bb.apply)(v, x)
    assert [f.shape[-1] for f in feats] == [18, 36, 72, 144]
    neck = HRFPN(in_channels=(18, 36, 72, 144), out_channels=64,
                 num_outs=5)
    nv = jax.jit(neck.init)(jax.random.PRNGKey(0), feats)
    outs = jax.jit(neck.apply)(nv, feats)
    assert len(outs) == 5 and all(o.shape[-1] == 64 for o in outs)


def test_resnet_basicblock_dcn_is_loud():
    import jax
    import jax.numpy as jnp
    import pytest
    from aidet_tpu.models.backbones.resnet import ResNet

    m = ResNet(depth=18, dcn=dict(modulated=True),
               stage_with_dcn=(False, True, True, True))
    with pytest.raises(ValueError, match="dcn"):
        jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0),
                                      jnp.ones((1, 32, 32, 3))))


def test_resnet_caffe_style_stride_placement():
    """style='caffe' puts the spatial stride on the first 1x1 instead
    of the 3x3 (reference resnet.py conv1_stride switch, the
    r50_caffe configs).  Same output shapes, different param layout is
    NOT observable from shape -- so check the downsampling actually
    happens inside conv1 by probing the intermediate."""
    import jax
    import jax.numpy as jnp
    from aidet_tpu.models.backbones.resnet import Bottleneck, ResNet

    x = jnp.ones((1, 64, 64, 3))
    for style in ("pytorch", "caffe"):
        m = ResNet(depth=50, style=style, frozen_stages=-1)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        outs = jax.jit(m.apply)(v, x)
        assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]
        assert [o.shape[1] for o in outs] == [16, 8, 4, 2]

    # unit check on one strided block: caffe conv1 output is already
    # spatially halved, pytorch conv1 output is full-res
    feat = jnp.ones((1, 16, 16, 256))
    for style, expect in (("pytorch", 16), ("caffe", 8)):
        blk = Bottleneck(planes=128, stride=2, style=style,
                         downsample=True)
        bv = blk.init(jax.random.PRNGKey(0), feat)
        _, inter = blk.apply(bv, feat, capture_intermediates=True)
        flat = {"/".join(k): val for k, val in
                __import__("flax").traverse_util.flatten_dict(
                    inter["intermediates"]).items()}
        conv1_out = [val for k, val in flat.items()
                     if "conv1" in k and "__call__" in k][0]
        if isinstance(conv1_out, tuple):  # flax stores (out,) tuples
            conv1_out = conv1_out[0]
        assert conv1_out.shape[1] == expect, (style, conv1_out.shape)


def test_gn_gcb_fp16_config_families():
    """configs/gn, gn+ws, gcnet, fp16 parity: the family knobs build
    and forward (GroupNorm replaces FrozenBN, ContextBlock attaches,
    detector-level dtype propagates to sub-configs)."""
    import flax
    import jax
    import jax.numpy as jnp
    from aidet_tpu.models import build_detector
    from aidet_tpu.utils.config import Config

    cfg = Config.fromfile("configs/mask_rcnn_r50_fpn_gn_2x.py")
    mc = dict(cfg.model)
    mc["img_size"] = 128
    m = build_detector(mc, train_cfg=cfg.get("train_cfg"),
                       test_cfg=cfg.get("test_cfg"))
    x = jnp.ones((1, 128, 128, 3))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    keys = {"/".join(k) for k in
            flax.traverse_util.flatten_dict(v["params"])}
    assert any("lateral_norm" in k for k in keys), "FPN GN missing"
    assert any("shared_norm" in k for k in keys), "bbox-head GN missing"
    assert any("norm0" in k and "mask" in k.lower() or "norm0" in k
               for k in keys), "mask-head GN missing"
    # GN backbone keeps no frozen stats
    assert "batch_stats" not in v
    feats = jax.jit(
        lambda vv, xx: m.apply(vv, xx, method="extract_feat"))(v, x)
    assert feats[0].shape[-1] == 256

    # gcb: context_block params appear only in stages 2-4
    cfg2 = Config.fromfile("configs/mask_rcnn_r16_gcb_c3-c5_r50_fpn_1x.py")
    mc2 = dict(cfg2.model); mc2["img_size"] = 128
    m2 = build_detector(mc2, train_cfg=cfg2.get("train_cfg"),
                        test_cfg=cfg2.get("test_cfg"))
    v2 = jax.jit(m2.init)(jax.random.PRNGKey(0), x)
    k2 = {"/".join(k) for k in
          flax.traverse_util.flatten_dict(v2["params"])}
    assert any("context_block" in k and "layer2" in k for k in k2)
    assert not any("context_block" in k and "layer1_" in k for k in k2)

    # fp16: detector dtype reaches sub-modules built from config dicts
    cfg3 = Config.fromfile("configs/faster_rcnn_r50_fpn_fp16_1x.py")
    mc3 = dict(cfg3.model); mc3["img_size"] = 128
    mc3["dtype"] = jnp.bfloat16
    m3 = build_detector(mc3, train_cfg=cfg3.get("train_cfg"),
                        test_cfg=cfg3.get("test_cfg"))
    v3 = jax.jit(m3.init)(jax.random.PRNGKey(0), x)
    f3 = jax.jit(
        lambda vv, xx: m3.apply(vv, xx, method="extract_feat"))(v3, x)
    assert f3[0].dtype == jnp.bfloat16


def test_fcos_center_sampling_unit():
    """center_sample_radius restricts positives to the center region
    (parity: FCOSHead.get_sample_region; the fcos_center config)."""
    from aidet_tpu.core.points import fcos_target
    # box 64x64 centered at (32,32); stride 8 → radius 1.5*8=12
    pts = jnp.asarray([[30., 30.], [58., 58.]])  # center-ish vs corner
    rr = jnp.asarray([[-1., 1e8], [-1., 1e8]])
    strides = jnp.asarray([8., 8.])
    gt = jnp.asarray([[0., 0., 64., 64.]])
    valid = jnp.asarray([True])
    lab = jnp.asarray([3])
    # without center sampling: both points positive
    l0, _, _ = fcos_target(pts, rr, gt, valid, lab)
    assert int(l0[0]) == 3 and int(l0[1]) == 3
    # with center sampling: only the near-center point stays positive
    l1, _, _ = fcos_target(pts, rr, gt, valid, lab, strides=strides,
                           center_sample_radius=1.5)
    assert int(l1[0]) == 3 and int(l1[1]) == 0


def test_single_stage_stacked_neck():
    """neck may be a list (FPN → BFP), parity:
    configs/libra_rcnn/libra_retinanet_r50_fpn_1x.py."""
    model = build_detector(dict(
        type="RetinaNet",
        backbone=dict(type="ResNet", depth=18),
        neck=[dict(type="FPN", in_channels=(64, 128, 256, 512),
                   out_channels=64, num_outs=5, start_level=1,
                   add_extra_convs=True),
              dict(type="BFP", in_channels=64, num_levels=5,
                   refine_level=1)],
        bbox_head=dict(type="RetinaHead", num_classes=16,
                       in_channels=64, feat_channels=64,
                       stacked_convs=1, num_anchors=9),
        loss_bbox=dict(type="BalancedL1Loss", alpha=0.5, gamma=1.5,
                       beta=0.11, loss_weight=1.0),
        test_cfg=dict(nms_pre=200, max_per_img=20),
        img_size=IMG))
    data = _fcos_data()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])
    losses = jax.jit(functools.partial(model.apply, method="loss"))(
        variables, rngs={"sampling": jax.random.PRNGKey(1)}, **data)
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k
    out = jax.jit(functools.partial(model.apply, method="predict"))(
        variables, data["imgs"], data["img_shapes"])
    assert out["boxes"].shape == (1, 20, 4)
