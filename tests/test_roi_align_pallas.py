"""Pallas RoIAlign kernel parity (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import aidet_tpu.ops.roi_align_pallas as rap
from aidet_tpu.ops.roi_align import batched_multilevel_roi_align


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)
    monkeypatch.setattr(pl, "pallas_call", patched)


def test_pallas_matches_xla(interpret_pallas):
    rng = np.random.RandomState(0)
    b, r, c = 2, 24, 32
    feats = [jnp.asarray(rng.randn(b, 256 // s, 256 // s, c)
                         .astype(np.float32)) for s in (4, 8, 16, 32)]
    xy = rng.uniform(0, 150, (b, r, 2))
    wh = rng.uniform(10, 100, (b, r, 2))
    rois = jnp.asarray(np.concatenate(
        [xy, np.minimum(xy + wh, 255)], -1).astype(np.float32))
    ref = batched_multilevel_roi_align(feats, rois, 7)
    out = rap._roi_align_pallas_fwd(feats, rois, 7, (4, 8, 16, 32), 2,
                                    56, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)


def test_pallas_gradient_flows(interpret_pallas):
    feats = [jnp.ones((1, 64 // s, 64 // s, 8)) for s in (4, 8, 16, 32)]
    rois = jnp.asarray([[[4., 4., 40., 40.]]])
    g = jax.grad(lambda fs: rap.roi_align_pallas(fs, rois, 7).sum())(
        feats)
    total = sum(float(jnp.abs(x).sum()) for x in g)
    assert np.isfinite(total) and total > 0


def test_pallas_level_bump_extreme_aspect(interpret_pallas):
    """Extreme-aspect rois are bumped one level coarser (the documented
    deviation): the result should match the XLA formulation evaluated
    with the SAME bumped assignment."""
    rng = np.random.RandomState(1)
    c = 16
    feats = [jnp.asarray(rng.randn(1, 512 // s, 512 // s, c)
                         .astype(np.float32)) for s in (4, 8, 16, 32)]
    # 300x8 px: scale=49 → nominal level 0, span 75 ≫ window
    rois = jnp.asarray([[[10., 100., 310., 108.]]])
    out = rap._roi_align_pallas_fwd(feats, rois, 7, (4, 8, 16, 32), 2,
                                    56, True)
    assert bool(jnp.isfinite(out).all())
    # must not be all-zero (the window covers the roi at some level)
    assert float(jnp.abs(out).max()) > 0


def test_band_kernel_matches_window_kernel(monkeypatch):
    """Band-cached inference kernel (roi_align_band) vs the window
    kernel on bf16 features (interpret mode; bf16-MXU tolerance)."""
    monkeypatch.setenv("AIDET_BAND_INTERPRET", "1")
    from aidet_tpu.ops.roi_align_band import roi_align_band
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def patched(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)
    monkeypatch.setattr(pl, "pallas_call", patched)

    rng = np.random.RandomState(0)
    b, r, c = 2, 24, 128
    feats = [jnp.asarray(rng.randn(b, 256 // s, 256 // s, c)
                         .astype(np.float32)).astype(jnp.bfloat16)
             for s in (4, 8, 16, 32)]
    xy = rng.uniform(0, 150, (b, r, 2))
    wh = rng.uniform(10, 100, (b, r, 2))
    rois = jnp.asarray(np.concatenate(
        [xy, np.minimum(xy + wh, 255)], -1).astype(np.float32))
    ref = np.asarray(rap._roi_align_pallas_fwd(
        feats, rois, 7, (4, 8, 16, 32), 2, 56, True), np.float32)
    out = np.asarray(roi_align_band(feats, rois, 7, (4, 8, 16, 32)),
                     np.float32)
    np.testing.assert_allclose(out, ref, atol=0.05)


def test_bandx_kernel_matches_window_kernel(monkeypatch):
    """Chunk-grid x-first kernel (roi_align_bandx) vs the window
    kernel, pooled sizes 7 and 14 (interpret mode)."""
    monkeypatch.setenv("AIDET_BANDX_INTERPRET", "1")
    from aidet_tpu.ops.roi_align_bandx import roi_align_bandx
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def patched(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)
    monkeypatch.setattr(pl, "pallas_call", patched)

    rng = np.random.RandomState(3)
    b, r, c = 2, 24, 128
    feats = [jnp.asarray(rng.randn(b, 256 // s, 256 // s, c)
                         .astype(np.float32)).astype(jnp.bfloat16)
             for s in (4, 8, 16, 32)]
    xy = rng.uniform(0, 150, (b, r, 2))
    wh = rng.uniform(10, 100, (b, r, 2))
    rois = jnp.asarray(np.concatenate(
        [xy, np.minimum(xy + wh, 255)], -1).astype(np.float32))
    for size in (7, 14):
        ref = np.asarray(rap._roi_align_pallas_fwd(
            feats, rois, size, (4, 8, 16, 32), 2, 56, True), np.float32)
        out = np.asarray(roi_align_bandx(feats, rois, size,
                                         (4, 8, 16, 32)), np.float32)
        np.testing.assert_allclose(out, ref, atol=0.05)


def test_band_kernel_mask_size(monkeypatch):
    """Band kernel at the mask-branch output size (14) — used by the
    predict mask path via _roi_features(..., 14, infer=True)."""
    monkeypatch.setenv("AIDET_BAND_INTERPRET", "1")
    from aidet_tpu.ops.roi_align_band import roi_align_band
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def patched(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)
    monkeypatch.setattr(pl, "pallas_call", patched)

    rng = np.random.RandomState(2)
    b, r, c = 1, 8, 128
    feats = [jnp.asarray(rng.randn(b, 256 // s, 256 // s, c)
                         .astype(np.float32)).astype(jnp.bfloat16)
             for s in (4, 8, 16, 32)]
    xy = rng.uniform(0, 150, (b, r, 2))
    wh = rng.uniform(12, 80, (b, r, 2))
    rois = jnp.asarray(np.concatenate(
        [xy, np.minimum(xy + wh, 255)], -1).astype(np.float32))
    ref = np.asarray(rap._roi_align_pallas_fwd(
        feats, rois, 14, (4, 8, 16, 32), 2, 56, True), np.float32)
    out = np.asarray(roi_align_band(feats, rois, 14, (4, 8, 16, 32)),
                     np.float32)
    np.testing.assert_allclose(out, ref, atol=0.05)
