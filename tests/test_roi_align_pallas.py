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


def test_big_image_falls_back_to_xla(monkeypatch):
    """img_size > 1024 (coarsest map taller than one window) must take
    the XLA path: the kernel's forced fit at the top level would
    silently zero-weight the overflow rows of near-full-patch rois."""
    from jax.experimental import pallas as pl

    def boom(*a, **k):
        raise AssertionError("pallas_call must not run for big images")
    import aidet_tpu.ops.roi_align_pallas as rap
    import aidet_tpu.ops.roi_align_band as rab
    import aidet_tpu.ops.roi_align_bandx as rabx
    import aidet_tpu.ops.rroi_align_pallas as rrap
    for m in (rap, rab, rabx, rrap):
        monkeypatch.setattr(m.pl, "pallas_call", boom, raising=True)

    b, c = 1, 8
    sizes = [320, 160, 80, 40]                    # img 1280, strides 4..32
    feats = [jnp.ones((b, s, s, c), jnp.bfloat16) for s in sizes]
    rois = jnp.asarray([[[8.0, 8.0, 1240.0, 1240.0]]])  # near-full patch
    out = rap.roi_align_pallas(feats, rois, 7)
    ref = __import__(
        "aidet_tpu.ops.roi_align", fromlist=["x"]
    ).batched_multilevel_roi_align(feats, rois, out_size=7)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=1e-3)
    # every pooled bin of a full-image roi on an all-ones map is ~1 —
    # the pre-fix kernel pooled ZEROS beyond the 32-row window
    assert float(np.asarray(out, np.float32).min()) > 0.9
    out_b = rab.roi_align_band(feats, rois, 7)
    np.testing.assert_allclose(np.asarray(out_b, np.float32),
                               np.asarray(ref, np.float32), atol=1e-3)
    rrois = jnp.asarray([[[624.0, 624.0, 1200.0, 1200.0, -0.4]]])
    out_r = rrap.rroi_align_pallas(feats, rrois, 7)
    assert np.isfinite(np.asarray(out_r, np.float32)).all()
    # bandx guard triggers at coarsest > 48 rows (img > 1536)
    sizes2 = [512, 256, 128, 64]
    feats2 = [jnp.ones((b, s, s, c), jnp.bfloat16) for s in sizes2]
    rois2 = jnp.asarray([[[8.0, 8.0, 2000.0, 2000.0]]])
    out_x = rabx.roi_align_bandx(feats2, rois2, 7)
    assert float(np.asarray(out_x, np.float32).min()) > 0.9


def test_pallas_backward_matches_xla_grad(interpret_pallas):
    """The linear_transpose backward must equal the XLA formulation's
    own gradient (RoIAlign is linear in feats, so the transpose IS the
    gradient — no primal re-execution needed)."""
    rng = np.random.RandomState(2)
    b, r, c = 2, 8, 8
    feats = [jnp.asarray(rng.randn(b, 128 // s, 128 // s, c)
                         .astype(np.float32)) for s in (4, 8, 16, 32)]
    xy = rng.uniform(0, 60, (b, r, 2))
    wh = rng.uniform(8, 60, (b, r, 2))
    rois = jnp.asarray(np.concatenate(
        [xy, np.minimum(xy + wh, 127)], -1).astype(np.float32))
    w = jnp.asarray(rng.randn(7, 7, c).astype(np.float32))

    def loss_pallas(fs):
        return jnp.sum(rap.roi_align_pallas(fs, rois, 7) * w)

    def loss_xla(fs):
        return jnp.sum(batched_multilevel_roi_align(fs, rois, 7) * w)

    g_p = jax.grad(loss_pallas)(feats)
    g_x = jax.grad(loss_xla)(feats)
    for a, e in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=1e-5)
