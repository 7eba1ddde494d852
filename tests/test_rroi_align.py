"""Rotated RoIAlign vs a numpy oracle of the standard CUDA semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from aidet_tpu.ops.roi_align import multilevel_roi_align_fused
from aidet_tpu.ops.rroi_align import batched_rroi_align, rroi_align_fused


def _np_bilinear(feat, y, x):
    h, w = feat.shape[:2]
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(feat.shape[-1], np.float32)
    y = min(max(y, 0.0), h - 1)
    x = min(max(x, 0.0), w - 1)
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
    ly, lx = y - y0, x - x0
    return (feat[y0, x0] * (1 - ly) * (1 - lx)
            + feat[y0, x1] * (1 - ly) * lx
            + feat[y1, x0] * ly * (1 - lx)
            + feat[y1, x1] * ly * lx)


def _np_rroi_align(feats, rroi, out_size, strides, s=2,
                   finest_scale=56):
    w, h = rroi[2], rroi[3]
    lvl = int(np.clip(np.floor(np.log2(
        np.sqrt(max(w * h, 1e-6)) / finest_scale + 1e-6)), 0,
        len(strides) - 1))
    f = feats[lvl]
    inv = 1.0 / strides[lvl]
    cx, cy = rroi[0] * inv - 0.5, rroi[1] * inv - 0.5
    rw, rh = max(w * inv, 1e-3), max(h * inv, 1e-3)
    th = rroi[4]
    ct, st = np.cos(th), np.sin(th)
    out = np.zeros((out_size, out_size, f.shape[-1]), np.float32)
    for i in range(out_size):
        for j in range(out_size):
            acc = np.zeros(f.shape[-1], np.float32)
            for iy in range(s):
                for ix in range(s):
                    yy = ((i + (iy + 0.5) / s) / out_size - 0.5) * rh
                    xx = ((j + (ix + 0.5) / s) / out_size - 0.5) * rw
                    x = cx + xx * ct - yy * st
                    y = cy + xx * st + yy * ct
                    acc += _np_bilinear(f, y, x)
            out[i, j] = acc / (s * s)
    return out


def test_rroi_align_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    strides = (4, 8, 16, 32)
    feats = [rng.randn(256 // st, 256 // st, 8).astype(np.float32)
             for st in strides]
    rrois = np.array([
        [60.0, 80.0, 48.0, 24.0, -0.7],
        [128.0, 128.0, 150.0, 90.0, -1.2],
        [200.0, 40.0, 30.0, 30.0, 0.0],
        [40.0, 200.0, 90.0, 20.0, -0.2],
        [10.0, 10.0, 16.0, 8.0, -1.5],    # near the border → oob zeros
    ], np.float32)
    out = jax.jit(lambda fs, r: rroi_align_fused(fs, r, 7, strides))(
        [jnp.asarray(f) for f in feats], jnp.asarray(rrois))
    for i, rr in enumerate(rrois):
        exp = _np_rroi_align(feats, rr, 7, strides)
        np.testing.assert_allclose(np.asarray(out[i]), exp, atol=1e-4,
                                   rtol=1e-4)


def test_rroi_align_theta_zero_equals_axis_aligned():
    rng = np.random.RandomState(1)
    strides = (4, 8, 16, 32)
    feats = [jnp.asarray(rng.randn(256 // st, 256 // st, 16)
                         .astype(np.float32)) for st in strides]
    cxcy = rng.uniform(40, 200, (12, 2)).astype(np.float32)
    wh = rng.uniform(16, 120, (12, 2)).astype(np.float32)
    rrois = jnp.asarray(np.concatenate(
        [cxcy, wh, np.zeros((12, 1), np.float32)], -1))
    hrois = jnp.asarray(np.concatenate(
        [cxcy - wh / 2, cxcy + wh / 2], -1))
    out_r = rroi_align_fused(feats, rrois, 7, strides)
    out_h = multilevel_roi_align_fused(feats, hrois, 7, strides)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_h),
                               atol=1e-4, rtol=1e-4)


def test_batched_rroi_align_shape_and_grad():
    strides = (4, 8, 16, 32)
    feats_b = [jnp.ones((2, 64 // st, 64 // st, 4)) for st in strides]
    rrois_b = jnp.asarray([[[20.0, 20.0, 16.0, 8.0, -0.5]],
                           [[40.0, 30.0, 24.0, 12.0, -1.0]]])
    out = batched_rroi_align(feats_b, rrois_b, out_size=5)
    assert out.shape == (2, 1, 5, 5, 4)

    def loss(fs):
        return batched_rroi_align(fs, rrois_b, out_size=5).sum()
    g = jax.grad(loss)(feats_b)
    total = sum(float(jnp.abs(x).sum()) for x in g)
    assert np.isfinite(total) and total > 0
