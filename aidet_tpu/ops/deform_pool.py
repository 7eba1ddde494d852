"""Deformable RoI pooling (DCN position-sensitive pooling).

TPU-native equivalent of the reference CUDA op
(mmdet/ops/dcn/deform_pool.py + src/deform_pool_cuda_kernel.cu):
each output bin averages ``sample_per_part``² bilinear samples taken
from the bin's sub-grid, shifted by a per-bin learned offset scaled by
``trans_std`` and the roi size; samples outside the feature map are
dropped from the average (mask + count instead of ``continue``).

Design notes: the sample lattice is a fixed [R, P, P, S, S] tensor so
everything is one gather + masked mean — no data-dependent control
flow.  Rois are processed in chunks via ``lax.map`` to bound the
gather working set.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _bilinear_gather(feat, ys, xs):
    """feat [H, W, C]; ys/xs [...]: bilinear samples [..., C]."""
    h, w, _ = feat.shape
    flat = feat.reshape(h * w, -1)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly = ys - y0
    lx = xs - x0
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)

    def g(yy, xx):
        return flat[yy * w + xx]
    v00 = g(y0i, x0i)
    v01 = g(y0i, x1i)
    v10 = g(y1i, x0i)
    v11 = g(y1i, x1i)
    wy = ly[..., None]
    wx = lx[..., None]
    return ((1 - wy) * ((1 - wx) * v00 + wx * v01)
            + wy * ((1 - wx) * v10 + wx * v11))


def deform_roi_pool(feat, rois, offsets=None, out_size: int = 7,
                    spatial_scale: float = 1.0,
                    sample_per_part: int = 4,
                    trans_std: float = 0.0,
                    chunk: int = 64):
    """Deformable RoI pooling over one feature map.

    Parity: deform_pool_cuda_kernel.cu DeformablePSROIPoolForwardKernel
    (group_size=1, the DeformRoIPoolingPack configuration).

    Args:
      feat: [H, W, C] feature map.
      rois: [R, 4] boxes in image coordinates.
      offsets: [R, P, P, 2] normalized per-bin (x, y) offsets, or None.
      out_size: P, the pooled resolution.
      spatial_scale: feature stride reciprocal.
      trans_std: offset scale (0 disables the shift).
      chunk: rois per lax.map step (memory bound for the gather).
    Returns [R, P, P, C].
    """
    hh, ww, _ = feat.shape
    r = rois.shape[0]
    p = out_size
    s = sample_per_part
    x1 = jnp.round(rois[:, 0]) * spatial_scale - 0.5
    y1 = jnp.round(rois[:, 1]) * spatial_scale - 0.5
    x2 = (jnp.round(rois[:, 2]) + 1.0) * spatial_scale - 0.5
    y2 = (jnp.round(rois[:, 3]) + 1.0) * spatial_scale - 0.5
    rw = jnp.maximum(x2 - x1, 0.1)
    rh = jnp.maximum(y2 - y1, 0.1)
    bw = rw / p
    bh = rh / p
    if offsets is None:
        tx = jnp.zeros((r, p, p))
        ty = jnp.zeros((r, p, p))
    else:
        tx = offsets[..., 0] * trans_std
        ty = offsets[..., 1] * trans_std
    grid = jnp.arange(p, dtype=jnp.float32)
    # bin start + learned shift (in roi-size units), [R, P(h), P(w)]
    wstart = (grid[None, None, :] * bw[:, None, None]
              + x1[:, None, None] + tx * rw[:, None, None])
    hstart = (grid[None, :, None] * bh[:, None, None]
              + y1[:, None, None] + ty * rh[:, None, None])
    sub = jnp.arange(s, dtype=jnp.float32)
    sw = (bw / s)[:, None, None, None, None]
    sh = (bh / s)[:, None, None, None, None]
    xs = wstart[..., None, None] + sub[None, None, None, None, :] * sw
    ys = hstart[..., None, None] + sub[None, None, None, :, None] * sh
    inside = ((xs >= -0.5) & (xs <= ww - 0.5)
              & (ys >= -0.5) & (ys <= hh - 0.5))
    xs = jnp.clip(xs, 0.0, ww - 1.0)
    ys = jnp.clip(ys, 0.0, hh - 1.0)

    def pool_chunk(args):
        cxs, cys, cin = args                  # [K, P, P, S, S]
        vals = _bilinear_gather(feat, cys, cxs) * cin[..., None]
        cnt = cin.sum(axis=(-1, -2))          # [K, P, P]
        return vals.sum(axis=(-2, -3)) / jnp.maximum(cnt, 1.0)[..., None]

    if r <= chunk:
        return pool_chunk((xs, ys, inside.astype(feat.dtype)))
    pad = (-r) % chunk
    def pad0(a):
        return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
    n_chunks = (r + pad) // chunk
    def resh(a):
        return pad0(a).reshape((n_chunks, chunk) + a.shape[1:])
    out = jax.lax.map(pool_chunk, (resh(xs), resh(ys),
                                   resh(inside.astype(feat.dtype))))
    return out.reshape((r + pad, p, p, -1))[:r]


class DeformRoIPoolingPack(nn.Module):
    """Learned-offset deformable RoI pooling (DeformRoIPoolingPack,
    deform_pool.py:113-175): a no-offset pool feeds FC layers that
    predict per-bin offsets (zero-init) for a second, shifted pool."""
    out_size: int = 7
    out_channels: int = 256
    spatial_scale: float = 1.0
    sample_per_part: int = 4
    trans_std: float = 0.1
    num_offset_fcs: int = 3
    deform_fc_channels: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, rois):
        p = self.out_size
        base = deform_roi_pool(feat, rois, None, p, self.spatial_scale,
                               self.sample_per_part)
        x = base.reshape(rois.shape[0], -1)
        for i in range(self.num_offset_fcs - 1):
            x = nn.relu(nn.Dense(self.deform_fc_channels,
                                 dtype=self.dtype,
                                 name=f"offset_fc{i}")(x))
        off = nn.Dense(p * p * 2, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros,
                       name="offset_out")(x)
        # reference layout is [N, 2, P, P] with x-plane then y-plane
        off = off.reshape(rois.shape[0], 2, p, p)
        off = jnp.stack([off[:, 0], off[:, 1]], -1)      # [N, P, P, 2]
        return deform_roi_pool(feat, rois, off, p, self.spatial_scale,
                               self.sample_per_part, self.trans_std)


class ModulatedDeformRoIPoolingPack(nn.Module):
    """DeformRoIPoolingPack + a learned per-bin sigmoid mask
    (deform_pool.py:177-254)."""
    out_size: int = 7
    out_channels: int = 256
    spatial_scale: float = 1.0
    sample_per_part: int = 4
    trans_std: float = 0.1
    num_offset_fcs: int = 3
    num_mask_fcs: int = 2
    deform_fc_channels: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, rois):
        p = self.out_size
        base = deform_roi_pool(feat, rois, None, p, self.spatial_scale,
                               self.sample_per_part)
        x = base.reshape(rois.shape[0], -1)
        o = x
        for i in range(self.num_offset_fcs - 1):
            o = nn.relu(nn.Dense(self.deform_fc_channels,
                                 dtype=self.dtype,
                                 name=f"offset_fc{i}")(o))
        off = nn.Dense(p * p * 2, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros,
                       name="offset_out")(o)
        off = off.reshape(rois.shape[0], 2, p, p)
        off = jnp.stack([off[:, 0], off[:, 1]], -1)
        m = x
        for i in range(self.num_mask_fcs - 1):
            m = nn.relu(nn.Dense(self.deform_fc_channels,
                                 dtype=self.dtype,
                                 name=f"mask_fc{i}")(m))
        mask = jax.nn.sigmoid(nn.Dense(
            p * p, dtype=self.dtype, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="mask_out")(m)).reshape(rois.shape[0], p, p, 1)
        pooled = deform_roi_pool(feat, rois, off, p, self.spatial_scale,
                                 self.sample_per_part, self.trans_std)
        return pooled * mask
