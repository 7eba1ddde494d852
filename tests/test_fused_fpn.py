"""Fused FPN / RPN kernels (ops/fused_fpn.py): parity vs the XLA
reference replicas and vs the flax modules, grads, module tree."""

import jax
import jax.numpy as jnp
import numpy as np

from aidet_tpu.ops.fused_fpn import fpn_fused, fpn_ref, rpn_fused, rpn_ref


def _pyramid(rng, b=1, h=32, chans=(32, 64, 128)):
    xs, hh = [], h
    for c in chans:
        xs.append(jnp.asarray(rng.normal(0, 1, (b, hh, hh, c)),
                              jnp.float32))
        hh //= 2
    return tuple(xs)


def _fpn_weights(rng, chans, co=32):
    def n(*s):
        return jnp.asarray(rng.normal(0, 0.1, s), jnp.float32)

    wls = tuple(n(c, co) for c in chans)
    bls = tuple(n(co) for _ in chans)
    wps = tuple(n(3, 3, co, co) for _ in chans)
    bps = tuple(n(co) for _ in chans)
    return wls, bls, wps, bps


def test_fpn_fused_matches_ref():
    rng = np.random.RandomState(0)
    chans = (32, 64, 128)
    xs = _pyramid(rng, h=32, chans=chans)
    ws = _fpn_weights(rng, chans)
    ref = fpn_ref(xs, ws)
    out = fpn_fused(xs, ws, True)
    assert len(out) == len(ref)
    for o, r in zip(out, ref):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)


def test_fpn_fused_grad():
    rng = np.random.RandomState(1)
    chans = (16, 32)
    xs = _pyramid(rng, h=16, chans=chans)
    ws = _fpn_weights(rng, chans, co=16)

    def loss_f(xs, ws):
        return sum(jnp.sum(o ** 2) for o in fpn_fused(xs, ws, True))

    def loss_r(xs, ws):
        return sum(jnp.sum(o ** 2) for o in fpn_ref(xs, ws))

    gx, gw = jax.grad(loss_f, argnums=(0, 1))(xs, ws)
    gx_r, gw_r = jax.grad(loss_r, argnums=(0, 1))(xs, ws)
    for a, b in zip(jax.tree_util.tree_leaves((gx, gw)),
                    jax.tree_util.tree_leaves((gx_r, gw_r))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_fpn_module_fused_matches_unfused():
    from aidet_tpu.models.necks.fpn import FPN

    chans = (32, 64, 128)
    kw = dict(in_channels=chans, out_channels=32, num_outs=4)
    mod = FPN(**kw)
    mod_f = FPN(fused=True, **kw)
    xs = _pyramid(np.random.RandomState(2), h=32, chans=chans)
    v = mod.init(jax.random.PRNGKey(0), xs)
    v_f = mod_f.init(jax.random.PRNGKey(0), xs)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v_f))
    outs = mod.apply(v, xs)
    outs_f = mod_f.apply(v, xs)
    assert len(outs) == len(outs_f) == 4
    for o, of in zip(outs, outs_f):
        np.testing.assert_allclose(np.asarray(o), np.asarray(of),
                                   rtol=1e-4, atol=1e-4)


def test_rpn_fused_matches_ref_and_module():
    from aidet_tpu.models.heads.rpn_head import RPNHead

    rng = np.random.RandomState(3)
    feats = _pyramid(rng, h=32, chans=(32, 32, 32))

    def n(*s):
        return jnp.asarray(rng.normal(0, 0.1, s), jnp.float32)

    ws = (n(3, 3, 32, 32), n(32), n(32, 3), n(3), n(32, 12), n(12))
    cls_r, reg_r = rpn_ref(feats, ws)
    cls_f, reg_f = rpn_fused(feats, ws, True)
    for a, b in zip(cls_f + reg_f, cls_r + reg_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)

    kw = dict(in_channels=32, feat_channels=32, num_anchors=3)
    mod = RPNHead(**kw)
    mod_f = RPNHead(fused=True, **kw)
    v = mod.init(jax.random.PRNGKey(0), feats)
    v_f = mod_f.init(jax.random.PRNGKey(0), feats)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v_f))
    c0, r0 = mod.apply(v, feats)
    c1, r1 = mod_f.apply(v, feats)
    for a, b in zip(c0 + r0, c1 + r1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_rpn_fused_grad():
    rng = np.random.RandomState(4)
    feats = _pyramid(rng, h=16, chans=(32,))

    def n(*s):
        return jnp.asarray(rng.normal(0, 0.1, s), jnp.float32)

    ws = (n(3, 3, 32, 32), n(32), n(32, 3), n(3), n(32, 12), n(12))

    def loss_f(feats, ws):
        c, r = rpn_fused(feats, ws, True)
        return sum(jnp.sum(o ** 2) for o in c + r)

    def loss_r(feats, ws):
        c, r = rpn_ref(feats, ws)
        return sum(jnp.sum(o ** 2) for o in c + r)

    g_f = jax.grad(loss_f, argnums=(0, 1))(feats, ws)
    g_r = jax.grad(loss_r, argnums=(0, 1))(feats, ws)
    for a, b in zip(jax.tree_util.tree_leaves(g_f),
                    jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)
