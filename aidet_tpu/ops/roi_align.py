"""RoIAlign as vectorized bilinear gathers — pure XLA, autodiff-safe.

TPU-native replacement for the reference's CUDA kernels
(mmdet/ops/roi_align/src/roi_align_kernel.cu v1 and _v2.cu
aligned=True), and for the per-level Python loop + dynamic routing in
SingleRoIExtractor (mmdet/models/roi_extractors/single_level.py:54-107).

Design: feature maps are NHWC (TPU-friendly); every roi samples a
static (out_h*ratio, out_w*ratio) grid of bilinear points via gathers;
FPN level routing is one-hot masking over per-level results computed
for ALL rois, so shapes stay static under jit.  The backward pass is
XLA's scatter-add of the gather — no custom VJP needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _bilinear_gather(feat: jax.Array, ys: jax.Array, xs: jax.Array):
    """Sample feat [H, W, C] at float coords (ys, xs) [...], bilinear.

    Out-of-range samples contribute 0, matching the CUDA kernel's
    boundary handling (roi_align_kernel.cu bilinear_interpolate).
    """
    h, w = feat.shape[0], feat.shape[1]
    oob = (ys < -1.0) | (ys > h) | (xs < -1.0) | (xs > w)
    y = jnp.clip(ys, 0.0, h - 1)
    x = jnp.clip(xs, 0.0, w - 1)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = y - y0
    lx = x - x0
    hy = 1.0 - ly
    hx = 1.0 - lx

    v00 = feat[y0, x0]
    v01 = feat[y0, x1]
    v10 = feat[y1, x0]
    v11 = feat[y1, x1]
    out = (v00 * (hy * hx)[..., None] + v01 * (hy * lx)[..., None]
           + v10 * (ly * hx)[..., None] + v11 * (ly * lx)[..., None])
    return jnp.where(oob[..., None], 0.0, out)


@functools.partial(
    jax.jit,
    static_argnames=("out_size", "spatial_scale", "sampling_ratio",
                     "aligned"))
def roi_align(feat: jax.Array, rois: jax.Array, out_size: int = 7,
              spatial_scale: float = 1.0, sampling_ratio: int = 2,
              aligned: bool = True) -> jax.Array:
    """RoIAlign on a single feature level.

    Args:
      feat: [H, W, C] feature map (single image) — NHWC inner layout.
      rois: [K, 4] boxes (x1, y1, x2, y2) in image coords.
      out_size: output bins per side (e.g. 7 for bbox head, 14 for mask).
      spatial_scale: feature stride reciprocal.
      sampling_ratio: bilinear samples per bin side (static; the
        reference's adaptive ratio-0 mode is not jit-able, and its
        configs always use ratio 2 — e.g. configs/dota/*: sample_num=2).
      aligned: True → v2/Detectron2 semantics (−0.5 offset,
        roi_align_kernel_v2.cu); False → v1 semantics.
    Returns [K, out_size, out_size, C].
    """
    offset = 0.5 if aligned else 0.0
    x1 = rois[:, 0] * spatial_scale - offset
    y1 = rois[:, 1] * spatial_scale - offset
    x2 = rois[:, 2] * spatial_scale - offset
    y2 = rois[:, 3] * spatial_scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:  # v1 clamps size at 1 (roi_align_kernel.cu)
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    s = sampling_ratio
    n_pts = out_size * s
    # sample-point centers: bin b, sub-sample j → (b + (j+0.5)/s) * bin_sz
    grid = (jnp.arange(n_pts, dtype=feat.dtype) + 0.5) / s  # [P] in bin units
    bin_h = roi_h / out_size
    bin_w = roi_w / out_size
    ys = y1[:, None] + grid[None, :] * bin_h[:, None]        # [K, P]
    xs = x1[:, None] + grid[None, :] * bin_w[:, None]        # [K, P]

    yy = jnp.broadcast_to(ys[:, :, None], ys.shape + (n_pts,))
    xx = jnp.broadcast_to(xs[:, None, :], (xs.shape[0], n_pts, n_pts))
    vals = _bilinear_gather(feat, yy, xx)                    # [K, P, P, C]

    k, c = rois.shape[0], feat.shape[-1]
    vals = vals.reshape(k, out_size, s, out_size, s, c)
    return vals.mean(axis=(2, 4))


def map_roi_levels(rois: jax.Array, num_levels: int,
                   finest_scale: int = 56) -> jax.Array:
    """FPN level per roi: floor(log2(sqrt(area) / finest + 1e-6)).

    Parity: SingleRoIExtractor.map_roi_levels
    (mmdet/models/roi_extractors/single_level.py:54-73).
    """
    scale = jnp.sqrt((rois[:, 2] - rois[:, 0] + 1.0)
                     * (rois[:, 3] - rois[:, 1] + 1.0))
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    return jnp.clip(lvl, 0, num_levels - 1).astype(jnp.int32)


def multilevel_roi_align(feats, rois, out_size=7, featmap_strides=(4, 8, 16, 32),
                         sampling_ratio=2, finest_scale=56, aligned=True,
                         roi_scale_factor=None):
    """RoIAlign over an FPN pyramid with static one-hot level routing.

    The reference loops levels and scatters per-level results
    (single_level.py:89-107); here every roi is sampled from every
    level and combined with a one-hot level mask — 4× redundant FLOPs
    but branchless, fully batched, and XLA-fusable, which wins on TPU.

    Args:
      feats: list of [H_l, W_l, C] maps (single image), finest first.
      rois: [K, 4].
    Returns [K, out_size, out_size, C].
    """
    num_levels = len(featmap_strides)
    lvls = map_roi_levels(rois, num_levels, finest_scale)
    if roi_scale_factor is not None:
        rois = roi_rescale(rois, roi_scale_factor)
    out = None
    for i, stride in enumerate(featmap_strides):
        r = roi_align(feats[i], rois, out_size, 1.0 / stride,
                      sampling_ratio, aligned)
        mask = (lvls == i).astype(r.dtype)[:, None, None, None]
        out = r * mask if out is None else out + r * mask
    return out


def multilevel_roi_align_fused(feats, rois, out_size=7,
                               featmap_strides=(4, 8, 16, 32),
                               sampling_ratio=2, finest_scale=56,
                               aligned=True, roi_scale_factor=None):
    """RoIAlign over an FPN pyramid via ONE gather from the flattened
    pyramid — no per-level recompute.

    All levels are concatenated into a [T, C] table; each roi's sample
    coordinates are computed against its own level's geometry (per-roi
    stride/size arithmetic is pure vector math), producing flat indices
    into the table.  4x fewer FLOPs and gather traffic than the
    masked per-level formulation in :func:`multilevel_roi_align`.

    Args/returns identical to :func:`multilevel_roi_align`.
    """
    num_levels = len(featmap_strides)
    c = feats[0].shape[-1]
    hs = jnp.asarray([f.shape[0] for f in feats], jnp.float32)
    ws = jnp.asarray([f.shape[1] for f in feats], jnp.float32)
    sizes = [f.shape[0] * f.shape[1] for f in feats]
    offs = jnp.asarray(
        [sum(sizes[:i]) for i in range(num_levels)], jnp.float32)
    table = jnp.concatenate([f.reshape(-1, c) for f in feats], axis=0)

    lvls = map_roi_levels(rois, num_levels, finest_scale)
    if roi_scale_factor is not None:
        rois = roi_rescale(rois, roi_scale_factor)

    stride = jnp.asarray(featmap_strides, jnp.float32)[lvls]   # [K]
    h_l = hs[lvls]
    w_l = ws[lvls]
    off_l = offs[lvls]

    offset = 0.5 if aligned else 0.0
    inv = 1.0 / stride
    x1 = rois[:, 0] * inv - offset
    y1 = rois[:, 1] * inv - offset
    x2 = rois[:, 2] * inv - offset
    y2 = rois[:, 3] * inv - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    s = sampling_ratio
    n_pts = out_size * s
    grid = (jnp.arange(n_pts, dtype=rois.dtype) + 0.5) / s
    ys = y1[:, None] + grid[None, :] * (roi_h / out_size)[:, None]
    xs = x1[:, None] + grid[None, :] * (roi_w / out_size)[:, None]

    k = rois.shape[0]
    yy = jnp.broadcast_to(ys[:, :, None], (k, n_pts, n_pts))
    xx = jnp.broadcast_to(xs[:, None, :], (k, n_pts, n_pts))
    hb = h_l[:, None, None]
    wb = w_l[:, None, None]
    oob = (yy < -1.0) | (yy > hb) | (xx < -1.0) | (xx > wb)
    y = jnp.clip(yy, 0.0, hb - 1)
    x = jnp.clip(xx, 0.0, wb - 1)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y1i = jnp.minimum(y0 + 1, hb - 1)
    x1i = jnp.minimum(x0 + 1, wb - 1)
    ly = (y - y0)[..., None]
    lx = (x - x0)[..., None]

    base = off_l[:, None, None]

    def take(yi, xi):
        idx = (base + yi * wb + xi).astype(jnp.int32)
        return table[idx]                          # [K, P, P, C]

    v00 = take(y0, x0)
    v01 = take(y0, x1i)
    v10 = take(y1i, x0)
    v11 = take(y1i, x1i)
    out = (v00 * (1 - ly) * (1 - lx) + v01 * (1 - ly) * lx
           + v10 * ly * (1 - lx) + v11 * ly * lx)
    out = jnp.where(oob[..., None], 0.0, out)
    out = out.reshape(k, out_size, s, out_size, s, c)
    return out.mean(axis=(2, 4))


def batched_multilevel_roi_align(feats_b, rois_b, out_size=7,
                                 featmap_strides=(4, 8, 16, 32),
                                 sampling_ratio=2, finest_scale=56,
                                 aligned=True, roi_scale_factor=None):
    """Batched fused RoIAlign: the whole batch's pyramid flattens into
    ONE [B*T, C] table and all rois gather from it in a single 2-D
    gather — no vmap (XLA lowers batched gathers poorly on TPU).

    Args:
      feats_b: list of [B, H_l, W_l, C]; rois_b: [B, R, 4].
      roi_scale_factor: optional center-preserving roi rescale before
        pooling (SingleRoIExtractor.roi_rescale, single_level.py:75-87).
    Returns [B, R, out_size, out_size, C].
    """
    num_levels = len(featmap_strides)
    b, r = rois_b.shape[:2]
    c = feats_b[0].shape[-1]
    hs = jnp.asarray([f.shape[1] for f in feats_b], jnp.float32)
    ws = jnp.asarray([f.shape[2] for f in feats_b], jnp.float32)
    sizes = [f.shape[1] * f.shape[2] for f in feats_b]
    level_off = jnp.asarray(
        [sum(sizes[:i]) for i in range(num_levels)], jnp.float32)
    per_img = sum(sizes)
    # [B, sum(HW), C] → [B*sum(HW), C]
    table = jnp.concatenate(
        [f.reshape(b, -1, c) for f in feats_b], axis=1).reshape(-1, c)

    rois = rois_b.reshape(b * r, 4)
    # Level routing uses the UN-rescaled rois (single_level.py:96-100
    # maps levels first, then applies roi_rescale), matching
    # multilevel_roi_align / multilevel_roi_align_fused above.
    lvls = map_roi_levels(rois, num_levels, finest_scale)
    if roi_scale_factor is not None:
        rois = roi_rescale(rois, roi_scale_factor)
    img_off = jnp.repeat(
        jnp.arange(b, dtype=jnp.float32) * per_img, r)      # [B*R]

    stride = jnp.asarray(featmap_strides, jnp.float32)[lvls]
    h_l = hs[lvls]
    w_l = ws[lvls]
    base_off = img_off + level_off[lvls]

    offset = 0.5 if aligned else 0.0
    inv = 1.0 / stride
    x1 = rois[:, 0] * inv - offset
    y1 = rois[:, 1] * inv - offset
    roi_w = rois[:, 2] * inv - offset - x1
    roi_h = rois[:, 3] * inv - offset - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    s = sampling_ratio
    n_pts = out_size * s
    grid = (jnp.arange(n_pts, dtype=rois.dtype) + 0.5) / s
    ys = y1[:, None] + grid[None, :] * (roi_h / out_size)[:, None]
    xs = x1[:, None] + grid[None, :] * (roi_w / out_size)[:, None]

    k = b * r
    yy = jnp.broadcast_to(ys[:, :, None], (k, n_pts, n_pts))
    xx = jnp.broadcast_to(xs[:, None, :], (k, n_pts, n_pts))
    hb = h_l[:, None, None]
    wb = w_l[:, None, None]
    oob = (yy < -1.0) | (yy > hb) | (xx < -1.0) | (xx > wb)
    y = jnp.clip(yy, 0.0, hb - 1)
    x = jnp.clip(xx, 0.0, wb - 1)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y1i = jnp.minimum(y0 + 1, hb - 1)
    x1i = jnp.minimum(x0 + 1, wb - 1)
    ly = (y - y0)[..., None]
    lx = (x - x0)[..., None]
    base = base_off[:, None, None]

    # NOTE: plain advanced indexing (row gathers of [*, C]) is the fast
    # lowering here; explicit lax.gather with slice_sizes=(2, C) to
    # fetch x-neighbour pairs in one op lowered ~30x SLOWER on TPU.
    def take(yi, xi):
        idx = (base + yi * wb + xi).astype(jnp.int32)
        return table[idx]

    out = (take(y0, x0) * (1 - ly) * (1 - lx)
           + take(y0, x1i) * (1 - ly) * lx
           + take(y1i, x0) * ly * (1 - lx)
           + take(y1i, x1i) * ly * lx)
    out = jnp.where(oob[..., None], 0.0, out)
    out = out.reshape(k, out_size, s, out_size, s, c).mean(axis=(2, 4))
    return out.reshape(b, r, out_size, out_size, c)


def roi_rescale(rois, scale_factor):
    """Scale rois about their centers, keeping the reference's
    inclusive-pixel convention (SingleRoIExtractor.roi_rescale,
    single_level.py:75-87)."""
    cx = (rois[:, 0] + rois[:, 2]) * 0.5
    cy = (rois[:, 1] + rois[:, 3]) * 0.5
    w = (rois[:, 2] - rois[:, 0] + 1.0) * scale_factor
    h = (rois[:, 3] - rois[:, 1] + 1.0) * scale_factor
    return jnp.stack([cx - 0.5 * (w - 1), cy - 0.5 * (h - 1),
                      cx + 0.5 * (w - 1), cy + 0.5 * (h - 1)], axis=-1)
