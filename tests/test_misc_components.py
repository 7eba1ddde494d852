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


def test_instaboost_identity_without_package():
    ib = InstaBoost()
    img = np.zeros((8, 8, 3), np.uint8)
    anns = [dict(bbox=[1, 1, 3, 3])]
    img2, anns2 = ib(img, anns)
    assert img2 is img and anns2 is anns
