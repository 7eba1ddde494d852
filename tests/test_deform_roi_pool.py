"""deform_roi_pool / roi_pool tests against numpy oracles mirroring
the reference CUDA kernels (deform_pool_cuda_kernel.cu,
roi_pool_kernel.cu)."""

import jax
import jax.numpy as jnp
import numpy as np

from aidet_tpu.ops.deform_pool import (DeformRoIPoolingPack,
                                       ModulatedDeformRoIPoolingPack,
                                       deform_roi_pool)
from aidet_tpu.ops.roi_pool import roi_pool


def _oracle_deform_pool(feat, rois, offsets, out_size, scale,
                        spp, trans_std):
    h, w, c = feat.shape
    r = rois.shape[0]
    p = out_size
    out = np.zeros((r, p, p, c), np.float32)

    def bilin(y, x):
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        ly, lx = y - y0, x - x0
        y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
        y0, x0 = max(y0, 0), max(x0, 0)
        return ((1 - ly) * ((1 - lx) * feat[y0, x0] + lx * feat[y0, x1])
                + ly * ((1 - lx) * feat[y1, x0] + lx * feat[y1, x1]))

    for i in range(r):
        x1 = round(rois[i, 0]) * scale - 0.5
        y1 = round(rois[i, 1]) * scale - 0.5
        x2 = (round(rois[i, 2]) + 1) * scale - 0.5
        y2 = (round(rois[i, 3]) + 1) * scale - 0.5
        rw = max(x2 - x1, 0.1)
        rh = max(y2 - y1, 0.1)
        bw, bh = rw / p, rh / p
        for ph in range(p):
            for pw in range(p):
                tx = offsets[i, ph, pw, 0] * trans_std if offsets is not None else 0.0
                ty = offsets[i, ph, pw, 1] * trans_std if offsets is not None else 0.0
                ws = pw * bw + x1 + tx * rw
                hs = ph * bh + y1 + ty * rh
                acc = np.zeros(c, np.float32)
                cnt = 0
                for ih in range(spp):
                    for iw in range(spp):
                        xx = ws + iw * bw / spp
                        yy = hs + ih * bh / spp
                        if xx < -0.5 or xx > w - 0.5 or yy < -0.5 \
                                or yy > h - 0.5:
                            continue
                        acc += bilin(min(max(yy, 0.0), h - 1.0),
                                     min(max(xx, 0.0), w - 1.0))
                        cnt += 1
                if cnt:
                    out[i, ph, pw] = acc / cnt
    return out


def test_deform_roi_pool_matches_oracle():
    rng = np.random.RandomState(0)
    feat = rng.randn(24, 32, 5).astype(np.float32)
    rois = np.asarray([[4.0, 6.0, 20.0, 18.0],
                       [0.0, 0.0, 31.0, 23.0],
                       [10.0, 2.0, 14.0, 9.0]], np.float32)
    offsets = rng.uniform(-1, 1, (3, 7, 7, 2)).astype(np.float32)
    got = np.asarray(jax.jit(
        lambda f, r, o: deform_roi_pool(f, r, o, 7, 1.0, 4, 0.1))(
            jnp.asarray(feat), jnp.asarray(rois), jnp.asarray(offsets)))
    want = _oracle_deform_pool(feat, rois, offsets, 7, 1.0, 4, 0.1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_deform_roi_pool_chunked_matches_unchunked():
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.randn(16, 16, 4).astype(np.float32))
    rois = jnp.asarray(
        rng.uniform(0, 12, (10, 4)).astype(np.float32))
    rois = jnp.concatenate([jnp.minimum(rois[:, :2], rois[:, 2:]),
                            jnp.maximum(rois[:, :2], rois[:, 2:]) + 2],
                           -1)
    a = deform_roi_pool(feat, rois, None, 7, chunk=4)
    b = deform_roi_pool(feat, rois, None, 7, chunk=64)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_deform_pool_packs_forward_and_grad():
    rng = np.random.RandomState(2)
    feat = jnp.asarray(rng.randn(16, 16, 8).astype(np.float32))
    rois = jnp.asarray([[2.0, 2.0, 12.0, 12.0],
                        [0.0, 4.0, 8.0, 15.0]], np.float32)
    for cls in (DeformRoIPoolingPack, ModulatedDeformRoIPoolingPack):
        mod = cls(out_size=7, out_channels=8)
        v = jax.jit(mod.init)(jax.random.PRNGKey(0), feat, rois)
        out = jax.jit(mod.apply)(v, feat, rois)
        assert out.shape == (2, 7, 7, 8)
        # zero-init offset fc → pack output equals the plain pool
        base = deform_roi_pool(feat, rois, None, 7)
        if cls is DeformRoIPoolingPack:
            np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                                       rtol=1e-5, atol=1e-5)
        g = jax.grad(lambda v: mod.apply(v, feat, rois).sum())(v)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(bool(jnp.isfinite(l).all()) for l in leaves)


def _oracle_roi_pool(feat, rois, p, scale):
    h, w, c = feat.shape
    out = np.zeros((rois.shape[0], p, p, c), np.float32)
    for i, roi in enumerate(rois):
        x1, y1 = round(roi[0] * scale), round(roi[1] * scale)
        x2, y2 = round(roi[2] * scale), round(roi[3] * scale)
        rw, rh = max(x2 - x1 + 1, 1), max(y2 - y1 + 1, 1)
        for ph in range(p):
            for pw in range(p):
                xs = int(np.floor(pw * rw / p)) + x1
                xe = int(np.ceil((pw + 1) * rw / p)) + x1
                ys = int(np.floor(ph * rh / p)) + y1
                ye = int(np.ceil((ph + 1) * rh / p)) + y1
                xs, xe = max(xs, 0), min(xe, w)
                ys, ye = max(ys, 0), min(ye, h)
                if xe > xs and ye > ys:
                    out[i, ph, pw] = feat[ys:ye, xs:xe].max((0, 1))
    return out


def test_roi_pool_matches_oracle():
    rng = np.random.RandomState(3)
    feat = rng.randn(20, 28, 6).astype(np.float32)
    rois = np.asarray([[3.0, 2.0, 18.0, 14.0],
                       [0.0, 0.0, 27.0, 19.0],
                       [8.0, 8.0, 9.0, 9.0]], np.float32)
    got = np.asarray(jax.jit(
        lambda f, r: roi_pool(f, r, 7, 1.0))(jnp.asarray(feat),
                                             jnp.asarray(rois)))
    want = _oracle_roi_pool(feat, rois, 7, 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
