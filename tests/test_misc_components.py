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


def test_instaboost_loud_without_package():
    import importlib.util
    import pytest
    if importlib.util.find_spec("instaboostfast") is not None:
        pytest.skip("instaboostfast installed")
    with pytest.raises(ImportError, match="instaboostfast"):
        InstaBoost()
    # explicit opt-in keeps configs loadable as a no-op
    ib = InstaBoost(allow_identity=True)
    img = np.zeros((8, 8, 3), np.uint8)
    anns = [dict(bbox=[1, 1, 3, 3])]
    img2, anns2 = ib(img, anns)
    assert img2 is img and anns2 is anns


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
