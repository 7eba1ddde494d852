"""Rotated RoIAlign over an FPN pyramid (TPU/XLA formulation).

Not present in the reference CUDA stack (BASELINE.json names it as a
required-new op for the OBB heads): samples a P x P bin grid in the
roi's ROTATED frame — grid coordinates are an affine map of the bin
lattice — then bilinear-gathers from a flattened pyramid table exactly
like :func:`aidet_tpu.ops.roi_align.multilevel_roi_align_fused`.
Semantics follow the de-facto standard `roi_align_rotated` CUDA kernel
(mmrotate / detectron2): aligned sampling, out-of-range samples
contribute zero, sampling_ratio^2 subsamples averaged per bin.

rrois are (cx, cy, w, h, theta) in image pixels, theta in radians
(this repo's thetaobb convention, theta in [-pi/2, 0)); any theta
works — the rotation matrix is evaluated directly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def map_rroi_levels(rrois, num_levels: int, finest_scale: int = 56):
    """FPN level per rotated roi from sqrt(w*h), same policy as
    roi_align.map_roi_levels (single_level.py:52-74)."""
    scale = jnp.sqrt(jnp.maximum(rrois[:, 2] * rrois[:, 3], 1e-6))
    lvls = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    return jnp.clip(lvls, 0, num_levels - 1).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("out_size", "featmap_strides", "sampling_ratio",
                     "finest_scale", "aligned"))
def rroi_align_fused(feats, rrois, out_size: int = 7,
                     featmap_strides=(4, 8, 16, 32),
                     sampling_ratio: int = 2, finest_scale: int = 56,
                     aligned: bool = True):
    """Rotated multi-level RoIAlign for one image.

    Args:
      feats: list of [H_l, W_l, C] pyramid levels.
      rrois: [K, 5] (cx, cy, w, h, theta) in image pixels.
    Returns [K, out_size, out_size, C].
    """
    num_levels = len(featmap_strides)
    c = feats[0].shape[-1]
    hs = jnp.asarray([f.shape[0] for f in feats], jnp.float32)
    ws = jnp.asarray([f.shape[1] for f in feats], jnp.float32)
    sizes = [f.shape[0] * f.shape[1] for f in feats]
    offs = jnp.asarray(
        [sum(sizes[:i]) for i in range(num_levels)], jnp.float32)
    table = jnp.concatenate([f.reshape(-1, c) for f in feats], axis=0)

    lvls = map_rroi_levels(rrois, num_levels, finest_scale)
    stride = jnp.asarray(featmap_strides, jnp.float32)[lvls]   # [K]
    inv = 1.0 / stride
    offset = 0.5 if aligned else 0.0
    cx = rrois[:, 0] * inv - offset
    cy = rrois[:, 1] * inv - offset
    rw = jnp.maximum(rrois[:, 2] * inv, 1e-3)
    rh = jnp.maximum(rrois[:, 3] * inv, 1e-3)
    th = rrois[:, 4]
    cos_t = jnp.cos(th)
    sin_t = jnp.sin(th)

    s = sampling_ratio
    n_pts = out_size * s
    grid = (jnp.arange(n_pts, dtype=rrois.dtype) + 0.5) / s
    # local (unrotated) sample offsets from the roi centre
    yy_l = (grid / out_size - 0.5)[None, :] * rh[:, None]  # [K, n]
    xx_l = (grid / out_size - 0.5)[None, :] * rw[:, None]

    k = rrois.shape[0]
    yy = jnp.broadcast_to(yy_l[:, :, None], (k, n_pts, n_pts))
    xx = jnp.broadcast_to(xx_l[:, None, :], (k, n_pts, n_pts))
    ct = cos_t[:, None, None]
    st = sin_t[:, None, None]
    xs = cx[:, None, None] + xx * ct - yy * st
    ys = cy[:, None, None] + xx * st + yy * ct

    h_l = hs[lvls][:, None, None]
    w_l = ws[lvls][:, None, None]
    oob = (ys < -1.0) | (ys > h_l) | (xs < -1.0) | (xs > w_l)
    y = jnp.clip(ys, 0.0, h_l - 1)
    x = jnp.clip(xs, 0.0, w_l - 1)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y1 = jnp.minimum(y0 + 1, h_l - 1)
    x1 = jnp.minimum(x0 + 1, w_l - 1)
    ly = (y - y0)[..., None]
    lx = (x - x0)[..., None]

    base = offs[lvls][:, None, None]

    def take(yi, xi):
        idx = (base + yi * w_l + xi).astype(jnp.int32)
        return table[idx]

    v00 = take(y0, x0)
    v01 = take(y0, x1)
    v10 = take(y1, x0)
    v11 = take(y1, x1)
    out = (v00 * (1 - ly) * (1 - lx) + v01 * (1 - ly) * lx
           + v10 * ly * (1 - lx) + v11 * ly * lx)
    out = jnp.where(oob[..., None], 0.0, out)
    out = out.reshape(k, out_size, s, out_size, s, c)
    return out.mean(axis=(2, 4))


def batched_rroi_align(feats_b, rrois_b, out_size: int = 7,
                       featmap_strides=(4, 8, 16, 32),
                       sampling_ratio: int = 2,
                       finest_scale: int = 56, aligned: bool = True):
    """Batched rotated RoIAlign: feats_b [B, H, W, C] lists,
    rrois_b [B, R, 5] → [B, R, s, s, C]."""
    fn = functools.partial(
        rroi_align_fused, out_size=out_size,
        featmap_strides=tuple(featmap_strides),
        sampling_ratio=sampling_ratio, finest_scale=finest_scale,
        aligned=aligned)
    return jax.vmap(lambda fs, r: fn(list(fs), r))(
        list(feats_b), rrois_b)
