"""Fused bottleneck-chain kernel (ops/fused_resnet.py): parity vs the
XLA reference, ResNet integration (same params, same output), grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aidet_tpu.ops.fused_resnet import (bottleneck_chain,
                                        bottleneck_chain_ref, fold_bn)


def _rand_weights(rng, k, c, cm):
    def n(*s):
        return jnp.asarray(rng.normal(0, 0.1, s), jnp.float32)

    w1 = n(k, c, cm)
    w2 = n(k, 3, 3, cm, cm)
    w3 = n(k, cm, c)
    stats = [(n(k, d) * 0 + 1 + n(k, d) * 0.1,   # scale ~1
              n(k, d) * 0.1,                     # bias
              n(k, d) * 0.1,                     # mean
              jnp.abs(n(k, d)) + 1.0)            # var
             for d in (cm, cm, c)]
    folded = [fold_bn(*s) for s in stats]
    return (w1, folded[0][0], folded[0][1],
            w2, folded[1][0], folded[1][1],
            w3, folded[2][0], folded[2][1])


@pytest.mark.parametrize("k,h,w,c,cm", [(1, 16, 24, 128, 32),
                                        (2, 32, 16, 128, 32),
                                        (3, 24, 24, 256, 64)])
def test_chain_matches_reference(k, h, w, c, cm):
    rng = np.random.RandomState(k + h)
    ws = _rand_weights(rng, k, c, cm)
    ws = tuple(jnp.asarray(t, jnp.float32) for t in ws)
    x = jnp.asarray(rng.normal(0, 1, (2, h, w, c)), jnp.float32)

    ref = bottleneck_chain_ref(x, *ws)
    out = bottleneck_chain(x, ws, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_chain_bf16_close():
    rng = np.random.RandomState(0)
    ws = tuple(t.astype(jnp.bfloat16) if t.ndim > 2 else t
               for t in _rand_weights(rng, 2, 128, 32))
    x = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 128)), jnp.bfloat16)
    ref = bottleneck_chain_ref(x, *ws).astype(jnp.float32)
    out = bottleneck_chain(x, ws, True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.1, atol=0.1)


def test_chain_grad_flows():
    rng = np.random.RandomState(1)
    ws = _rand_weights(rng, 1, 128, 32)
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 128)), jnp.float32)

    def loss(x, ws):
        return jnp.sum(bottleneck_chain(x, ws, True) ** 2)

    gx, gw = jax.grad(loss, argnums=(0, 1))(x, ws)

    def loss_ref(x, ws):
        return jnp.sum(bottleneck_chain_ref(x, *ws) ** 2)

    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, ws)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw[0]), np.asarray(gw_r[0]),
                               rtol=1e-3, atol=1e-3)


def test_resnet_fused_matches_unfused():
    """Same rng -> identical param trees; fused forward == unfused."""
    from aidet_tpu.models.backbones.resnet import ResNet

    kw = dict(depth=50, base_channels=16, out_indices=(0, 1, 2, 3))
    bb = ResNet(**kw)
    bb_f = ResNet(fused_identity_chains=True, **kw)
    x = jnp.asarray(np.random.RandomState(3).normal(
        0, 1, (1, 64, 64, 3)), jnp.float32)
    v = jax.jit(bb.init)(jax.random.PRNGKey(0), x)
    v_f = jax.jit(bb_f.init)(jax.random.PRNGKey(0), x)
    # identical checkpoint trees
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v_f))
    for a, b in zip(jax.tree_util.tree_leaves(v),
                    jax.tree_util.tree_leaves(v_f)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    outs = bb.apply(v, x)
    outs_f = bb_f.apply(v, x)
    for o, of in zip(outs, outs_f):
        np.testing.assert_allclose(np.asarray(o), np.asarray(of),
                                   rtol=2e-3, atol=2e-3)
