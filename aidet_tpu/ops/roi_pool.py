"""Quantized max RoI pooling (legacy Fast R-CNN op).

TPU-native equivalent of the reference CUDA op
(mmdet/ops/roi_pool/src/roi_pool_kernel.cu): integer-rounded roi and
bin boundaries, max over each bin, empty bins → 0.

The reference marks roi_pool legacy (roi_align replaced it in every
config); this implementation goes for exact parity, not speed — bins
are realised as [P, H]/[P, W] membership masks and reduced with a
masked max, which is fine at detection feature-map sizes.  Use
``ops.roi_align`` (or the Pallas kernel) on the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def roi_pool(feat, rois, out_size: int = 7, spatial_scale: float = 1.0):
    """Max-pool each roi into a [P, P] grid.

    Args:
      feat: [H, W, C]; rois: [R, 4] image coords.
    Returns [R, P, P, C].
    """
    h, w, c = feat.shape
    p = out_size

    def one(roi):
        x1 = jnp.round(roi[0] * spatial_scale).astype(jnp.int32)
        y1 = jnp.round(roi[1] * spatial_scale).astype(jnp.int32)
        x2 = jnp.round(roi[2] * spatial_scale).astype(jnp.int32)
        y2 = jnp.round(roi[3] * spatial_scale).astype(jnp.int32)
        rw = jnp.maximum(x2 - x1 + 1, 1)
        rh = jnp.maximum(y2 - y1 + 1, 1)
        bins = jnp.arange(p, dtype=jnp.int32)
        # bin [start, end) on each axis (roi_pool_kernel.cu floor/ceil)
        # in exact integer arithmetic: floor(a/b)=a//b, ceil=(a+b-1)//b
        xs = bins * rw // p + x1
        xe = ((bins + 1) * rw + p - 1) // p + x1
        ys = bins * rh // p + y1
        ye = ((bins + 1) * rh + p - 1) // p + y1
        gx = jnp.arange(w, dtype=jnp.int32)
        gy = jnp.arange(h, dtype=jnp.int32)
        mx = (gx[None, :] >= jnp.clip(xs, 0, w)[:, None]) \
            & (gx[None, :] < jnp.clip(xe, 0, w)[:, None])     # [P, W]
        my = (gy[None, :] >= jnp.clip(ys, 0, h)[:, None]) \
            & (gy[None, :] < jnp.clip(ye, 0, h)[:, None])     # [P, H]
        neg = jnp.finfo(feat.dtype).min
        # max over x within each x-bin: [Px, H, C]
        fx = jnp.where(mx[:, None, :, None], feat[None], neg).max(2)
        # then over y within each y-bin: [Py, Px, C]
        out = jnp.where(my[:, None, :, None], fx[None], neg).max(2)
        empty = ~(my.any(-1)[:, None] & mx.any(-1)[None, :])
        return jnp.where(empty[..., None], 0.0, out)

    return jax.vmap(one)(rois)
