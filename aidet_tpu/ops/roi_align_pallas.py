"""Pallas TPU kernel for multi-level RoIAlign.

The XLA formulation gathers ~800 scattered feature rows per roi (4
bilinear corners x P² sample points) — gather-latency-bound on TPU.
This kernel restructures the op:

1. Every roi reads ONE contiguous [WIN_Y, WIN_X, C] window of its FPN
   level, fetched HBM→VMEM with a single async DMA (the window always
   covers the roi: level assignment is bumped until the roi's span
   fits, and at the coarsest level the window covers the whole map;
   x-origins are sublane-aligned for the DMA engine).
2. Bilinear sampling + avg pooling are SEPARABLE: the pooled output is
   out[p,q,:] = Σ_y Σ_x WY[p,y]·WX[q,x]·win[y,x,:] with per-roi
   weight matrices WY/WX [P, WIN] holding the (subsample-averaged)
   1-D interpolation weights.  Inside the kernel that is two small
   dot_generals on the MXU — no scatter/gather at all.

WY/WX and the window origins are precomputed in plain XLA (cheap,
vectorized over rois).  Backward runs the XLA reference formulation
via custom_vjp, so training is unaffected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align import batched_multilevel_roi_align, map_roi_levels

WIN_Y = 32        # window height (≥ max roi span + 2 after level bump)
WIN_X = 48        # window width: span + 2 + sublane alignment slack
SMALL_Y = 16      # small-window class: covers spans ≤ SMALL_Y - 2
SMALL_X = 32      # (x also loses ALIGN slack) — most DOTA rois fit,
                  # cutting the per-roi DMA bytes 3x
ALIGN = 16        # Mosaic needs DMA x-offsets aligned to the sublane tile
BLOCK_BF16 = 16   # rois per grid step (window VMEM budget)
BLOCK_F32 = 8     # f32 windows are twice the size


import os
_USE_SMALL = os.environ.get("AIDET_ROI_SMALL", "0") == "1"
_USE_FAST = os.environ.get("AIDET_ROI_FAST", "1") == "1"


def _win_sizes(feats):
    """Static (win_y, win_x) per roi class: class 2l = small window on
    level l, class 2l+1 = full window on level l."""
    sizes = []
    for f in feats:
        if _USE_SMALL:
            sizes.append((min(SMALL_Y, f.shape[1]),
                          min(SMALL_X, f.shape[2])))
        else:
            sizes.append((min(WIN_Y, f.shape[1]), min(WIN_X, f.shape[2])))
        sizes.append((min(WIN_Y, f.shape[1]), min(WIN_X, f.shape[2])))
    return tuple(sizes)


def _weights_1d(coords, origin, dim, width, out_size, s):
    """[K, n_pts] sample coords → pooled 1-D interpolation weights
    [K, out_size, width] relative to per-roi integer ``origin``.

    Shared by the window kernel (window-relative origins) and the
    band-x kernel (band-relative y origins, zero x origins)."""
    oob = (coords < -1.0) | (coords > dim[:, None])
    cc = jnp.clip(coords, 0.0, dim[:, None] - 1)
    c0 = jnp.floor(cc)
    frac = cc - c0
    c1 = jnp.minimum(c0 + 1, dim[:, None] - 1)
    loc0 = c0 - origin[:, None].astype(jnp.float32)
    loc1 = c1 - origin[:, None].astype(jnp.float32)
    iw = jax.lax.broadcasted_iota(jnp.float32, (1, 1, width), 2)
    w = ((iw == loc0[..., None]) * (1 - frac)[..., None]
         + (iw == loc1[..., None]) * frac[..., None])
    w = jnp.where(oob[..., None], 0.0, w)            # [K, n_pts, width]
    w = w.reshape(-1, out_size, s, width).sum(2) / s
    return w                                          # [K, out, width]


def _prepare(feats, rois_b, out_size, featmap_strides, sampling_ratio,
             finest_scale, aligned, use_small=None, with_coords=False):
    """Host-side (XLA) prep: per-roi class/window/weights.

    use_small: override the small-window partition (the band kernel
    needs uniform full-window origins so its 48-row bands always
    cover the window).
    with_coords: return raw sample coords instead of weight matrices."""
    num_levels = len(featmap_strides)
    b, r = rois_b.shape[:2]
    k = b * r
    rois = rois_b.reshape(k, 4)
    hs = jnp.asarray([f.shape[1] for f in feats], jnp.float32)
    ws = jnp.asarray([f.shape[2] for f in feats], jnp.float32)
    strides_arr = jnp.asarray(featmap_strides, jnp.float32)

    # per-level effective windows (levels can be smaller than WIN_*)
    win_ys = jnp.asarray([min(WIN_Y, f.shape[1]) for f in feats],
                         jnp.float32)
    win_xs = jnp.asarray([min(WIN_X, f.shape[2]) for f in feats],
                         jnp.float32)
    small_ys = jnp.asarray([min(SMALL_Y, f.shape[1]) for f in feats],
                           jnp.float32)
    small_xs = jnp.asarray([min(SMALL_X, f.shape[2]) for f in feats],
                           jnp.float32)

    lvls = map_roi_levels(rois, num_levels, finest_scale)
    # bump the level until the roi fits the window (extreme
    # aspect-ratio rois only; the coarsest level always fits because
    # the window covers the entire map there)
    h_px = rois[:, 3] - rois[:, 1]
    w_px = rois[:, 2] - rois[:, 0]
    for _ in range(num_levels - 1):
        inv_l = 1.0 / strides_arr[lvls]
        fit_y = h_px * inv_l <= win_ys[lvls] - 2
        # x-origin is aligned DOWN by up to ALIGN-1, eating window slack
        fit_x = w_px * inv_l <= win_xs[lvls] - ALIGN - 1
        fits = (fit_y & fit_x) | (lvls >= num_levels - 1)
        lvls = jnp.where(fits, lvls, lvls + 1)

    # small-window class: spans that fit a SMALL_Y x SMALL_X window
    # take a 3x cheaper DMA (class 2l); the rest use the full window
    # (class 2l+1)
    inv_l = 1.0 / strides_arr[lvls]
    small = ((h_px * inv_l <= small_ys[lvls] - 2)
             & (w_px * inv_l <= small_xs[lvls] - ALIGN - 1))
    if not (_USE_SMALL if use_small is None else use_small):
        small = jnp.zeros_like(small)
    cls_ids = lvls * 2 + jnp.where(small, 0, 1)
    cls_win_y = jnp.where(small, small_ys[lvls], win_ys[lvls])
    cls_win_x = jnp.where(small, small_xs[lvls], win_xs[lvls])

    stride = strides_arr[lvls]
    h_l = hs[lvls]
    w_l = ws[lvls]
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
    grid = (jnp.arange(n_pts, dtype=jnp.float32) + 0.5) / s
    ys = y1[:, None] + grid[None] * (roi_h / out_size)[:, None]  # [K,P]
    xs = x1[:, None] + grid[None] * (roi_w / out_size)[:, None]

    # window origin: cover floor(min)..floor(max)+1, clamped so the
    # roi class's (possibly smaller) window stays in-bounds; x
    # additionally aligned down to the sublane tile for the DMA
    wy = jnp.clip(jnp.floor(ys[:, 0]), 0,
                  jnp.maximum(h_l - cls_win_y, 0)).astype(jnp.int32)
    wx = jnp.clip(jnp.floor(xs[:, 0]), 0,
                  jnp.maximum(w_l - cls_win_x, 0)).astype(jnp.int32)
    wx = (wx // ALIGN) * ALIGN

    def weights_1d(coords, origin, dim, width):
        return _weights_1d(coords, origin, dim, width, out_size, s)

    b_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)
    if with_coords:
        # band-x kernel rebuilds its own weight matrices (band-relative
        # y origins, full-width x) from the raw sample coordinates
        return (cls_ids.astype(jnp.int32), b_idx, wy, wx,
                ys, xs, h_l, w_l)
    wy_mat = weights_1d(ys, wy, h_l, WIN_Y)
    wx_mat = weights_1d(xs, wx, w_l, WIN_X)
    return (cls_ids.astype(jnp.int32), b_idx, wy, wx,
            wy_mat.astype(jnp.float32), wx_mat.astype(jnp.float32))


def _kernel(num_levels, out_size, c, win_sizes, block, fast,
            active_cls, cls_ref, b_ref, wy_ref, wx_ref, *refs):
    feat_refs = refs[:num_levels]
    wy_mat_ref, wx_mat_ref, out_ref = refs[num_levels:num_levels + 3]
    win, sems = refs[num_levels + 3:]

    pid = pl.program_id(0)

    def dma_for(step, slot, j, cl):
        i = step * block + j
        wyl, wxl = win_sizes[cl]  # static per class (≤ WIN_Y/WIN_X)
        # hint: x-origins were aligned down to ALIGN on the host, but
        # Mosaic cannot prove that for a runtime scalar on its own
        wxo = pl.multiple_of(wx_ref[i], ALIGN)
        return pltpu.make_async_copy(
            feat_refs[cl // 2].at[b_ref[i], pl.ds(wy_ref[i], wyl),
                                  pl.ds(wxo, wxl), :],
            win.at[slot, j, pl.ds(0, wyl), pl.ds(0, wxl), :],
            sems.at[slot, j])

    def start_block(step, slot):
        for j in range(block):
            i = step * block + j
            for cl in active_cls:   # scalar branches are the kernel's
                @pl.when(cls_ref[i] == cl)  # wall — only live classes
                def _(j=j, cl=cl):
                    dma_for(step, slot, j, cl).start()

    # scratch starts with arbitrary bits; regions beyond a small
    # level's window are weight-zeroed, but 0·NaN would poison —
    # clear once on the first step
    @pl.when(pid == 0)
    def _():
        win[...] = jnp.zeros_like(win)

    # single-buffered: issue all of this block's DMAs up front so the
    # per-roi computes below overlap the remaining copies.  (A 2-slot
    # cross-block pipeline was measured SLOWER on v5e: the wall is the
    # scalar core issuing/waiting 1 DMA per roi at ~1.5us each, and
    # halving the block to fit two slots in VMEM raised the per-roi
    # scalar overhead.)
    start_block(pid, 0)

    def run_block(slot):
        for j in range(block):
            i = pid * block + j
            for cl in active_cls:
                @pl.when(cls_ref[i] == cl)
                def _(j=j, cl=cl):
                    dma_for(pid, slot, j, cl).wait()
        if fast:
            _fast_block(slot)
        else:
            _exact_block(slot)

    def _fast_block(slot):
        # bf16 fast path: per-roi separable dots in bf16 (features are
        # bf16-quantized already; the interpolation weights lose ~1e-3
        # relative).  NOTE the measured wall on v5e is the per-roi DMA
        # issue/wait (~1.5us each on the scalar core), not these dots.
        for j in range(block):
            w = win[slot, j]                          # [WIN, WIN, C] bf16
            wxm = wx_mat_ref[j].astype(jnp.bfloat16)  # [P, WIN]
            wym = wy_mat_ref[j].astype(jnp.bfloat16)
            t = jax.lax.dot_general(
                wxm, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # [P, WIN, C]
            o = jax.lax.dot_general(
                wym, t.astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # [P, P, C]
            out_ref[j] = o.astype(out_ref.dtype)

    def _exact_block(slot):
        for j in range(block):
            w = win[slot, j].astype(jnp.float32)      # [WIN, WIN, C]
            wxm = wx_mat_ref[j]                       # [P, WIN]
            wym = wy_mat_ref[j]
            # HIGHEST precision: default MXU precision rounds f32
            # operands to bf16, which would put the kernel ~1e-2 off
            # the exact-f32 elementwise XLA formulation
            prec = jax.lax.Precision.HIGHEST
            # T[q, y, c] = Σ_x wxm[q, x] · w[y, x, c]
            t = jax.lax.dot_general(
                wxm, w, (((1,), (1,)), ((), ())),
                precision=prec,
                preferred_element_type=jnp.float32)   # [P, WIN, C]
            # out[p, q, c] = Σ_y wym[p, y] · T[q, y, c]
            o = jax.lax.dot_general(
                wym, t, (((1,), (1,)), ((), ())),
                precision=prec,
                preferred_element_type=jnp.float32)   # [P, P, C]
            out_ref[j] = o.astype(out_ref.dtype)

    run_block(0)


def _roi_align_pallas_fwd(feats, rois_b, out_size, featmap_strides,
                          sampling_ratio, finest_scale, aligned):
    num_levels = len(featmap_strides)
    b, r = rois_b.shape[:2]
    k = b * r
    c = feats[0].shape[-1]
    # window scratch must fit VMEM: halve the block for 4-byte dtypes
    block = (BLOCK_BF16 if jnp.dtype(feats[0].dtype).itemsize <= 2
             else BLOCK_F32)
    pad = (-k) % block
    cls_ids, b_idx, wy, wx, wy_mat, wx_mat = _prepare(
        feats, rois_b, out_size, featmap_strides, sampling_ratio,
        finest_scale, aligned)
    if pad:
        cls_ids = jnp.pad(cls_ids, (0, pad))
        b_idx = jnp.pad(b_idx, (0, pad))
        wy = jnp.pad(wy, (0, pad))
        wx = jnp.pad(wx, (0, pad))
        wy_mat = jnp.pad(wy_mat, ((0, pad), (0, 0), (0, 0)))
        wx_mat = jnp.pad(wx_mat, ((0, pad), (0, 0), (0, 0)))
    kp = k + pad
    nblocks = kp // block

    # bf16 feature maps take the fast MXU path and stay bf16 on the
    # way out (the heads consume them in bf16 anyway — a f32 round
    # trip would double the crop traffic); f32 inputs keep the exact
    # f32 path whose output matches the XLA formulation bit-for-bit
    fast = (jnp.dtype(feats[0].dtype) == jnp.bfloat16) and _USE_FAST
    out_dtype = feats[0].dtype if fast else jnp.result_type(
        feats[0].dtype, jnp.float32)

    mat_specs = [
        pl.BlockSpec((block, out_size, WIN_Y),
                     lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block, out_size, WIN_X),
                     lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,      # cls_ids, b_idx, wy, wx
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * num_levels
        + mat_specs,
        out_specs=pl.BlockSpec(
            (block, out_size, out_size, c),
            lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, block, WIN_Y, WIN_X, c), feats[0].dtype),
            pltpu.SemaphoreType.DMA((1, block)),
        ])

    win_sizes = _win_sizes(feats)
    active_cls = tuple(
        cl for cl in range(2 * num_levels)
        if (cl % 2 == 1) or _USE_SMALL)
    out = pl.pallas_call(
        functools.partial(_kernel, num_levels, out_size, c, win_sizes,
                          block, fast, active_cls),
        out_shape=jax.ShapeDtypeStruct(
            (kp, out_size, out_size, c), out_dtype),
        grid_spec=grid_spec,
    )(cls_ids, b_idx, wy, wx, *feats, wy_mat, wx_mat)
    return out[:k].reshape(b, r, out_size, out_size, c)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(2, 3, 4, 5, 6))
def roi_align_pallas(feats, rois_b, out_size=7,
                     featmap_strides=(4, 8, 16, 32), sampling_ratio=2,
                     finest_scale=56, aligned=True):
    """Batched multi-level RoIAlign via the Pallas window kernel.

    Args/semantics match
    :func:`aidet_tpu.ops.roi_align.batched_multilevel_roi_align`
    (up to level-bumping of extreme-aspect rois whose span would not
    fit a WIN² window — those sample one level coarser).
    """
    feats = list(feats)
    if feats[-1].shape[1] > WIN_Y or feats[-1].shape[2] > WIN_X:
        # the level bump has nowhere to go past the coarsest level, so
        # the kernel's "coarsest always fits" invariant requires the
        # coarsest map to fit inside one window. img_size > 1024 (e.g.
        # the 1280 multi-scale configs) breaks it — a near-full-patch
        # roi would silently pool zeros beyond the window. Static
        # (trace-time) fallback to the XLA formulation.
        from .roi_align import batched_multilevel_roi_align
        return batched_multilevel_roi_align(
            feats, rois_b, out_size=out_size,
            featmap_strides=tuple(featmap_strides),
            sampling_ratio=sampling_ratio, finest_scale=finest_scale,
            aligned=aligned)
    return _roi_align_pallas_fwd(feats, rois_b, out_size,
                                 tuple(featmap_strides), sampling_ratio,
                                 finest_scale, aligned)


def _fwd(feats, rois_b, out_size, featmap_strides, sampling_ratio,
         finest_scale, aligned):
    out = roi_align_pallas(feats, rois_b, out_size, featmap_strides,
                           sampling_ratio, finest_scale, aligned)
    return out, (list(feats), rois_b)


def _bwd(out_size, featmap_strides, sampling_ratio, finest_scale,
         aligned, res, g):
    feats, rois_b = res
    # RoIAlign is linear in feats (the bilinear weights depend only on
    # rois), so the cotangent is a pure transpose: linear_transpose
    # evaluates ONLY the transposed scatter — unlike jax.vjp, which
    # would re-execute the slow XLA gather forward inside the backward
    # pass just to discard its primal output.
    f = lambda fs: batched_multilevel_roi_align(
        fs, rois_b, out_size, featmap_strides, sampling_ratio,
        finest_scale, aligned)
    (dfeats,) = jax.linear_transpose(f, feats)(
        g.astype(jax.eval_shape(f, feats).dtype))
    return dfeats, jnp.zeros_like(rois_b)


roi_align_pallas.defvjp(_fwd, _bwd)
