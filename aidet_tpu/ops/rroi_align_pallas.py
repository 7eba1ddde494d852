"""Pallas TPU kernel for rotated multi-level RoIAlign.

Rotated sampling is NOT separable in the image axes (the rotation
mixes x and y), so the separable two-matmul trick of
roi_align_pallas.py does not apply. Instead each sample point's 2-D
bilinear stencil is still an outer product of two 1-D weight vectors,
so the FULL per-roi interpolation matrix

    M[bin, (y, x)] = mean_sub  wy[sample, y] * wx[sample, x]

is assembled on the host (chunked einsum, bf16) and the kernel reduces
each roi with ONE MXU matmul:

    out[bin, c] = M @ window.reshape(WY*WX, C)

Data movement mirrors roi_align_pallas: one contiguous window DMA per
roi (level chosen so the roi's rotated AABB fits), M rows streamed per
block via the grid BlockSpec. bf16 fast path only — f32 callers use
the XLA formulation (rroi_align.py), which is also the custom_vjp
backward, so training through this op is exact-XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rroi_align import batched_rroi_align, map_rroi_levels

WIN_Y = 32
WIN_X = 48
ALIGN = 16
BLOCK = 8          # rois/grid step (VMEM: win 6.3M + M 1.2M + out)
CHUNK = 256        # host-side M assembly chunk (bounds the [K, n^2,
                   # WY, WX] outer-product intermediate)


def _prepare_rot(feats, rrois, out_size, featmap_strides,
                 sampling_ratio, finest_scale, aligned):
    """Host-side prep: per-roi level/window origin + dense M."""
    num_levels = len(featmap_strides)
    k = rrois.shape[0]
    hs = jnp.asarray([f.shape[1] for f in feats], jnp.float32)
    ws = jnp.asarray([f.shape[2] for f in feats], jnp.float32)
    strides_arr = jnp.asarray(featmap_strides, jnp.float32)
    win_ys = jnp.asarray([min(WIN_Y, f.shape[1]) for f in feats],
                         jnp.float32)
    win_xs = jnp.asarray([min(WIN_X, f.shape[2]) for f in feats],
                         jnp.float32)

    lvls = map_rroi_levels(rrois, num_levels, finest_scale)
    # rotated AABB spans decide window fit (bump to coarser levels for
    # large/extreme rois; coarsest always fits: window covers the map)
    cw, ch, th = rrois[:, 2], rrois[:, 3], rrois[:, 4]
    span_x = cw * jnp.abs(jnp.cos(th)) + ch * jnp.abs(jnp.sin(th))
    span_y = cw * jnp.abs(jnp.sin(th)) + ch * jnp.abs(jnp.cos(th))
    for _ in range(num_levels - 1):
        inv_l = 1.0 / strides_arr[lvls]
        fit = ((span_y * inv_l <= win_ys[lvls] - 2)
               & (span_x * inv_l <= win_xs[lvls] - ALIGN - 1)
               | (lvls >= num_levels - 1))
        lvls = jnp.where(fit, lvls, lvls + 1)

    stride = strides_arr[lvls]
    inv = 1.0 / stride
    offset = 0.5 if aligned else 0.0
    cx = rrois[:, 0] * inv - offset
    cy = rrois[:, 1] * inv - offset
    rw = jnp.maximum(cw * inv, 1e-3)
    rh = jnp.maximum(ch * inv, 1e-3)
    cos_t = jnp.cos(th)
    sin_t = jnp.sin(th)

    s = sampling_ratio
    n = out_size * s
    grid = (jnp.arange(n, dtype=jnp.float32) + 0.5) / s
    yy = (grid / out_size - 0.5)[None, :, None] * rh[:, None, None]
    xx = (grid / out_size - 0.5)[None, None, :] * rw[:, None, None]
    xs = cx[:, None, None] + xx * cos_t[:, None, None] \
        - yy * sin_t[:, None, None]                    # [K, n, n]
    ys = cy[:, None, None] + xx * sin_t[:, None, None] \
        + yy * cos_t[:, None, None]

    h_l = hs[lvls]
    w_l = ws[lvls]
    wy0 = jnp.clip(jnp.floor(ys.min((1, 2))), 0,
                   jnp.maximum(h_l - win_ys[lvls], 0)).astype(jnp.int32)
    wx0 = jnp.clip(jnp.floor(xs.min((1, 2))), 0,
                   jnp.maximum(w_l - win_xs[lvls], 0)).astype(jnp.int32)
    wx0 = (wx0 // ALIGN) * ALIGN

    def one_d(coords, origin, dim, width):
        """[Kc, n, n] coords → per-sample 1-D weights
        [Kc, n*n, width] (oob → 0)."""
        kc = coords.shape[0]
        flat = coords.reshape(kc, -1)
        oob = (flat < -1.0) | (flat > dim[:, None])
        cc = jnp.clip(flat, 0.0, dim[:, None] - 1)
        c0 = jnp.floor(cc)
        frac = cc - c0
        c1 = jnp.minimum(c0 + 1, dim[:, None] - 1)
        loc0 = c0 - origin[:, None].astype(jnp.float32)
        loc1 = c1 - origin[:, None].astype(jnp.float32)
        iw = jax.lax.broadcasted_iota(jnp.float32, (1, 1, width), 2)
        w = ((iw == loc0[..., None]) * (1 - frac)[..., None]
             + (iw == loc1[..., None]) * frac[..., None])
        return jnp.where(oob[..., None], 0.0, w)

    def m_chunk(args):
        ys_c, xs_c, wy0_c, wx0_c, hl_c, wl_c = args
        wy_s = one_d(ys_c, wy0_c, hl_c, WIN_Y)     # [C, n², WY]
        wx_s = one_d(xs_c, wx0_c, wl_c, WIN_X)     # [C, n², WX]
        kc = wy_s.shape[0]
        # regroup samples (a, b) = ((p, suby), (q, subx)) so the
        # s²-subsample mean is a reduction over one axis
        def regroup(w, width):
            w = w.reshape(kc, out_size, s, out_size, s, width)
            return w.transpose(0, 1, 3, 2, 4, 5).reshape(
                kc * out_size * out_size, s * s, width)
        wy_b = regroup(wy_s, WIN_Y)                # [(C·P²), s², WY]
        wx_b = regroup(wx_s, WIN_X)
        # broadcast-multiply + sub-axis reduce instead of a batched
        # [s²,WY]x[s²,WX] dot_general: those 4x32x48 matmuls pad to
        # full MXU tiles (<1% utilisation) and dominated the prep
        # (~9.6 of 14.4 ms at 1600 rois); the multiply-reduce fuses
        # on the VPU without materialising the outer product
        m = (wy_b[:, :, :, None] * wx_b[:, :, None, :]).sum(1)
        m = m / (s * s)
        return m.reshape(kc, out_size * out_size,
                         WIN_Y * WIN_X).astype(jnp.bfloat16)

    pad_k = (-k) % CHUNK
    def padk(a):
        return jnp.pad(a, ((0, pad_k),) + ((0, 0),) * (a.ndim - 1))
    args = (padk(ys).reshape(-1, CHUNK, n, n),
            padk(xs).reshape(-1, CHUNK, n, n),
            padk(wy0).reshape(-1, CHUNK),
            padk(wx0).reshape(-1, CHUNK),
            padk(h_l).reshape(-1, CHUNK),
            padk(w_l).reshape(-1, CHUNK))
    m = jax.lax.map(m_chunk, args)
    m = m.reshape(-1, out_size * out_size, WIN_Y * WIN_X)[:k]
    return lvls.astype(jnp.int32), wy0, wx0, m


def _kernel(num_levels, out_size, c, win_sizes, block,
            lvl_ref, b_ref, wy_ref, wx_ref, *refs):
    feat_refs = refs[:num_levels]
    m_ref, out_ref = refs[num_levels:num_levels + 2]
    win, sems = refs[num_levels + 2:]

    pid = pl.program_id(0)

    def dma_for(j, l):
        i = pid * block + j
        wyl, wxl = win_sizes[l]
        wxo = pl.multiple_of(wx_ref[i], ALIGN)
        return pltpu.make_async_copy(
            feat_refs[l].at[b_ref[i], pl.ds(wy_ref[i], wyl),
                            pl.ds(wxo, wxl), :],
            win.at[j, pl.ds(0, wyl), pl.ds(0, wxl), :],
            sems.at[j])

    @pl.when(pid == 0)
    def _():
        # scratch regions beyond a small level's window are read with
        # zero weight — they must hold finite bits
        win[...] = jnp.zeros_like(win)

    for j in range(block):
        i = pid * block + j
        for l in range(num_levels):
            @pl.when(lvl_ref[i] == l)
            def _(j=j, l=l):
                dma_for(j, l).start()

    for j in range(block):
        i = pid * block + j
        for l in range(num_levels):
            @pl.when(lvl_ref[i] == l)
            def _(j=j, l=l):
                dma_for(j, l).wait()
        w2d = win[j].reshape(WIN_Y * WIN_X, c)         # bf16
        o = jax.lax.dot_general(
            m_ref[j], w2d, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [P², C]
        out_ref[j] = o.reshape(out_size, out_size, c).astype(
            out_ref.dtype)


def _rroi_fwd(feats, rrois_b, out_size, featmap_strides,
              sampling_ratio, finest_scale, aligned):
    num_levels = len(featmap_strides)
    b, r = rrois_b.shape[:2]
    k = b * r
    c = feats[0].shape[-1]
    rrois = rrois_b.reshape(k, 5)
    lvls, wy0, wx0, m = _prepare_rot(
        feats, rrois, out_size, featmap_strides, sampling_ratio,
        finest_scale, aligned)
    b_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)

    pad = (-k) % BLOCK
    if pad:
        lvls = jnp.pad(lvls, (0, pad))
        wy0 = jnp.pad(wy0, (0, pad))
        wx0 = jnp.pad(wx0, (0, pad))
        b_idx = jnp.pad(b_idx, (0, pad))
        m = jnp.pad(m, ((0, pad), (0, 0), (0, 0)))
    kp = k + pad
    nblocks = kp // BLOCK

    win_sizes = tuple((min(WIN_Y, f.shape[1]), min(WIN_X, f.shape[2]))
                      for f in feats)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,     # lvl, b, wy, wx
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * num_levels
        + [pl.BlockSpec((BLOCK, out_size * out_size, WIN_Y * WIN_X),
                        lambda i, *_: (i, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (BLOCK, out_size, out_size, c),
            lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BLOCK, WIN_Y, WIN_X, c), feats[0].dtype),
            pltpu.SemaphoreType.DMA((BLOCK,)),
        ])
    import os
    out = pl.pallas_call(
        functools.partial(_kernel, num_levels, out_size, c, win_sizes,
                          BLOCK),
        out_shape=jax.ShapeDtypeStruct(
            (kp, out_size, out_size, c), feats[0].dtype),
        grid_spec=grid_spec,
        interpret=os.environ.get("AIDET_RROI_INTERPRET", "0") == "1",
    )(lvls, b_idx, wy0, wx0, *feats, m)
    return out[:k].reshape(b, r, out_size, out_size, c)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(2, 3, 4, 5, 6))
def rroi_align_pallas(feats, rrois_b, out_size=7,
                      featmap_strides=(4, 8, 16, 32),
                      sampling_ratio=2, finest_scale=56,
                      aligned=True):
    """Batched rotated multi-level RoIAlign, Pallas fast path.

    Same signature/semantics as
    :func:`aidet_tpu.ops.rroi_align.batched_rroi_align` (bf16 MXU
    numerics; backward = exact XLA formulation via custom_vjp).
    feats: list of [B, H, W, C]; rrois_b: [B, R, 5].
    """
    feats = list(feats)
    if feats[-1].shape[1] > WIN_Y or feats[-1].shape[2] > WIN_X:
        # coarsest level larger than one window: the forced fit at the
        # top level silently zero-weights the overflow (see
        # roi_align_pallas) — XLA fallback for img_size > 1024
        from .rroi_align import batched_rroi_align
        return batched_rroi_align(
            feats, rrois_b, out_size=out_size,
            featmap_strides=tuple(featmap_strides),
            sampling_ratio=sampling_ratio, finest_scale=finest_scale,
            aligned=aligned)
    return _rroi_fwd(feats, rrois_b, out_size,
                     tuple(featmap_strides), sampling_ratio,
                     finest_scale, aligned)


def _vjp_fwd(feats, rrois_b, out_size, featmap_strides,
             sampling_ratio, finest_scale, aligned):
    out = _rroi_fwd(list(feats), rrois_b, out_size,
                    tuple(featmap_strides), sampling_ratio,
                    finest_scale, aligned)
    return out, (list(feats), rrois_b)


def _vjp_bwd(out_size, featmap_strides, sampling_ratio, finest_scale,
             aligned, res, g):
    feats, rrois_b = res

    def xla(fs):
        return batched_rroi_align(
            fs, rrois_b, out_size=out_size,
            featmap_strides=tuple(featmap_strides),
            sampling_ratio=sampling_ratio, finest_scale=finest_scale,
            aligned=aligned)
    _, vjp = jax.vjp(xla, feats)
    # the XLA formulation accumulates in f32 regardless of feat dtype
    (gf,) = vjp(g.astype(jnp.float32))
    return gf, None


rroi_align_pallas.defvjp(_vjp_fwd, _vjp_bwd)
