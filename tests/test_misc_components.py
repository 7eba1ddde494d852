"""Tests for shared heads, plugins, InstaBoost stub."""

import jax
import jax.numpy as jnp
import numpy as np

from aidet_tpu.data.instaboost import InstaBoost
from aidet_tpu.models.plugins import (ContextBlock, ConvWS, NonLocal2D,
                                      Scale)
from aidet_tpu.models.shared_heads import ResLayer


def test_res_layer_shared_head():
    m = ResLayer(depth=50, stage=3, stride=2)
    x = jnp.ones((4, 14, 14, 1024))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(m.apply)(v, x)
    assert out.shape == (4, 7, 7, 2048)


def test_context_block_zero_init_is_identity():
    m = ContextBlock()
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 16)
                    .astype(np.float32))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(m.apply)(v, x)
    # channel-add conv2 is zero-init → exact identity at init
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_nonlocal_zero_init_is_identity():
    m = NonLocal2D()
    x = jnp.asarray(np.random.RandomState(1).randn(1, 6, 6, 8)
                    .astype(np.float32))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(m.apply)(v, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_convws_and_scale():
    m = ConvWS(features=4)
    x = jnp.ones((1, 8, 8, 3))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(m.apply)(v, x)
    assert out.shape == (1, 8, 8, 4)
    sc = Scale(init_value=2.0)
    vv = sc.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(sc.apply(vv, x)), 2.0)


def test_instaboost_map_and_paste_executes():
    """The native map-and-paste core must actually move an instance:
    pixels change, the bbox/segm/pointobb follow the same affine, and
    instances without segm ride through untouched."""
    rs = np.random.RandomState(5)
    img = np.full((96, 128, 3), 30, np.uint8)
    # a bright square instance at [40:60, 50:70]
    img[40:60, 50:70] = 220
    poly = [50.0, 40.0, 69.0, 40.0, 69.0, 59.0, 50.0, 59.0]
    anns = dict(
        bboxes=np.asarray([[50, 40, 69, 59], [5, 5, 20, 20]],
                          np.float32),
        labels=np.asarray([1, 2], np.int32),
        segmentations=[[poly], None],
        pointobbs=np.asarray([poly, [5, 5, 20, 5, 20, 20, 5, 20]],
                             np.float32),
    )
    ib = InstaBoost(aug_ratio=1.0, dx=8, dy=8, scale=(1.0, 1.0),
                    theta=(0, 0), color_prob=0.0, seed=3)
    img2, anns2 = ib(img, dict(anns))
    assert img2.shape == img.shape
    assert np.abs(img2.astype(int) - img.astype(int)).sum() > 0
    b0, b1 = anns2["bboxes"]
    # instance 0 moved (translation-only jitter, dx/dy up to 8 px)
    assert not np.allclose(b0, anns["bboxes"][0])
    assert np.allclose(b1, anns["bboxes"][1])  # no segm → untouched
    # pointobb followed the same affine as the bbox corners
    shift = b0[:2] - anns["bboxes"][0][:2]
    np.testing.assert_allclose(
        anns2["pointobbs"][0],
        anns["pointobbs"][0] + np.tile(shift, 4), atol=1.0)
    # the pasted instance is bright at its new bbox centre
    cx, cy = int((b0[0] + b0[2]) / 2), int((b0[1] + b0[3]) / 2)
    assert img2[cy, cx].mean() > 150
    # sample-level gate: aug_ratio=0 is identity
    ib0 = InstaBoost(aug_ratio=0.0, seed=3)
    img3, anns3 = ib0(img, anns)
    assert img3 is img and anns3 is anns


def test_generalized_attention_variants():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from aidet_tpu.models.plugins import GeneralizedAttention

    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 12, 16),
                    jnp.float32)
    for at in ("1111", "1000", "0100", "0010", "0001"):
        mod = GeneralizedAttention(in_dim=16, num_heads=4, kv_stride=2,
                                   attention_type=at)
        v = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
        out = jax.jit(mod.apply)(v, x)
        assert out.shape == x.shape, at
        # gamma is zero-init → identity at initialisation
        np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                                   rtol=1e-5, atol=1e-5)
        g = jax.grad(lambda v: mod.apply(v, x).sum())(v)
        assert all(bool(jnp.isfinite(l).all())
                   for l in jax.tree_util.tree_leaves(g)), at


def test_generalized_attention_spatial_range():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from aidet_tpu.models.plugins import GeneralizedAttention

    x = jnp.asarray(np.random.RandomState(1).randn(1, 8, 8, 8),
                    jnp.float32)
    mod = GeneralizedAttention(in_dim=8, num_heads=2, kv_stride=1,
                               spatial_range=2, attention_type="1000")
    v = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(mod.apply)(v, x)
    assert bool(jnp.isfinite(out).all())


def test_resnet_gen_attention_stages():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from aidet_tpu.models.backbones.resnet import ResNet

    net = ResNet(depth=18, base_channels=8,
                 gen_attention=dict(num_heads=2, kv_stride=2,
                                    attention_type="0010"),
                 gen_attention_stages=(False, False, True, True))
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3),
                    jnp.float32)
    v = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    assert any("gen_attention" in k for k in v["params"])
    outs = jax.jit(net.apply)(v, x)
    assert len(outs) == 4 and all(bool(jnp.isfinite(o).all())
                                  for o in outs)
