"""Pallas rotated RoIAlign vs the XLA formulation (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aidet_tpu.ops.rroi_align import batched_rroi_align


@pytest.fixture()
def interpret(monkeypatch):
    monkeypatch.setenv("AIDET_RROI_INTERPRET", "1")


def _mk(rng, b=2, r=12, c=128, img=256):
    feats = [jnp.asarray(rng.randn(b, img // s, img // s, c)
                         .astype(np.float32)).astype(jnp.bfloat16)
             for s in (4, 8, 16, 32)]
    cxcy = rng.uniform(60, img - 60, (b, r, 2)).astype(np.float32)
    wh = rng.uniform(16, 60, (b, r, 2)).astype(np.float32)  # <=60: no
    # AABB-fit level bump (the kernel's documented deviation from the
    # pure-scale XLA routing)
    th = rng.uniform(-np.pi / 2, 0, (b, r, 1)).astype(np.float32)
    rrois = jnp.asarray(np.concatenate([cxcy, wh, th], -1))
    return feats, rrois


def test_rroi_pallas_matches_xla(interpret):
    from aidet_tpu.ops.rroi_align_pallas import rroi_align_pallas
    rng = np.random.RandomState(0)
    feats, rrois = _mk(rng)
    ref = np.asarray(batched_rroi_align(feats, rrois, out_size=7),
                     np.float32)
    out = np.asarray(rroi_align_pallas(feats, rrois, 7), np.float32)
    np.testing.assert_allclose(out, ref, atol=0.06)


def test_rroi_pallas_backward_is_xla(interpret):
    from aidet_tpu.ops.rroi_align_pallas import rroi_align_pallas
    rng = np.random.RandomState(1)
    feats, rrois = _mk(rng, b=1, r=4, c=128, img=128)

    g_pl = jax.grad(lambda fs: rroi_align_pallas(fs, rrois, 7)
                    .astype(jnp.float32).sum())(feats)
    g_xla = jax.grad(lambda fs: batched_rroi_align(fs, rrois, 7)
                     .astype(jnp.float32).sum())(feats)
    for a, b_ in zip(g_pl, g_xla):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   atol=0.05)
