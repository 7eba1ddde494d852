"""Chunk-grid x-first Pallas RoIAlign (bf16 inference fast path).

Third formulation of the RoIAlign data movement (after the
window-per-roi kernel in roi_align_pallas.py and the band-cached
window kernel in roi_align_band.py).  The band kernel is limited by
per-roi VMEM window copies and small block-diagonal matmul shapes
(measured window-copy/matmul-shape bound at BLOCK=4, and BLOCK=8 is
VMEM-infeasible).  This kernel removes the per-roi window copies
entirely:

1. HOST: the feature pyramid is pre-transposed to x-major
   ``[B, W, H, C]`` (one XLA pass at memcpy bandwidth) and rois are
   grouped into chunks of R rois sharing one (image, level, 48-row
   y-band) key.
2. KERNEL, per chunk: the x-major band ``[W, 48, C]`` is DMA'd once
   (reload only on key change), and ALL R rois are reduced with two
   large MXU matmuls straight out of the band — no window extraction:
     t1[(r,p), (y,c)]  = Wx[(r,p), X] @ band[X, (y,c)]   (full-width x)
     out[(r,q), (p,c)] = Wy_bd[(r,q), (r,y)] @ t1'[(r,y), (p,c)]
   Wx carries each roi's x-interpolation weights scattered over the
   full level width (zeros elsewhere), so the x-contraction is one
   [R*out, W] @ [W, 48*C] product.  Wy_bd is built in-kernel from the
   compact [R*out, 48] band-relative y weights with an iota mask
   (streaming the expanded block-diagonal from HBM would cost ~16x
   the compact form).
3. HOST: outputs are gathered back to the caller's roi order.

Semantics match roi_align_pallas (aligned RoIAlign v2, level routing
with window-fit bumping — parity vs mmdet RoIAlign,
/root/reference/mmdet/ops/roi_align/src/roi_align_kernel.cu); numerics
are bf16-MXU.  Inference-only (no VJP): the train path keeps the
window kernel's custom_vjp.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BAND_S = 16       # band stride in feature rows
BAND_H = 48       # band height: any 32-row sample window starting
                  # inside a 16-row stride fits


def _chunk_size(out_size):
    # chunk rows R*out_size ~ the 128-row MXU tile
    return max(1, 128 // out_size)


def _kernel(num_levels, out_size, c, csplit, rows_l, wl_list, chunk,
            wpad, key_ref, b_ref, lvl_ref, row0_ref, *refs):
    feat_refs = refs[:num_levels]
    wx_ref, wy_ref, out_ref = refs[num_levels:num_levels + 3]
    band, loaded, sem = refs[num_levels + 3:]

    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        loaded[0] = -1
        # band regions beyond a small level's rows/width are read with
        # zero weight — they must hold finite bits, not scratch poison
        band[...] = jnp.zeros_like(band)

    # one band DMA per chunk AT MOST; consecutive chunks of a large
    # group skip it entirely (keys are sorted).  The row offset is
    # carried as row0//8 and rescaled here so Mosaic can PROVE the
    # dynamic dim-2 slice is sublane-aligned (tile 8) — a raw dynamic
    # offset fails to compile ("tile index in dimension 2 is divisible
    # by the tiling"); the host guarantees row0 % 16 == 0 by padding
    # level heights to multiples of 16.
    @pl.when(key_ref[pid] != loaded[0])
    def _():
        for l in range(num_levels):
            @pl.when(lvl_ref[pid] == l)
            def _(l=l):
                cp = pltpu.make_async_copy(
                    feat_refs[l].at[b_ref[pid], :,
                                    pl.ds(row0_ref[pid] * 8, rows_l[l]),
                                    :],
                    band.at[pl.ds(0, wl_list[l]),
                            pl.ds(0, rows_l[l]), :],
                    sem)
                cp.start()
                cp.wait()
        loaded[0] = key_ref[pid]

    p = out_size
    wx = wx_ref[0]                                    # [R*p, Wpad]
    wyc = wy_ref[0]                                   # [R*p, 48]
    # block-diagonal Wy from the compact form: row (r*p+q) holds
    # Wy_r[q, :] in columns [r*48, (r+1)*48)
    rows_i = jax.lax.broadcasted_iota(
        jnp.int32, (chunk * p, chunk * BAND_H), 0)
    cols_i = jax.lax.broadcasted_iota(
        jnp.int32, (chunk * p, chunk * BAND_H), 1)
    mask = (cols_i // BAND_H) == (rows_i // p)
    wy_bd = jnp.where(mask, jnp.tile(wyc, (1, chunk)),
                      jnp.zeros((), wyc.dtype))

    cpart = c // csplit
    for part in range(csplit):
        bp = band[:, :, part * cpart:(part + 1) * cpart]
        bp = bp.reshape(wpad, BAND_H * cpart)         # [X, (y,c)]
        t1 = jax.lax.dot_general(
            wx, bp, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [(r,p), (y,c)]
        t1 = t1.reshape(chunk, p, BAND_H, cpart)
        t1 = jnp.swapaxes(t1, 1, 2).reshape(
            chunk * BAND_H, p * cpart).astype(wy_bd.dtype)
        o = jax.lax.dot_general(
            wy_bd, t1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [(r,q), (p,c)]
        out_ref[:, :, :, part * cpart:(part + 1) * cpart] = (
            o.reshape(chunk, p, p, cpart).astype(out_ref.dtype))


def roi_align_bandx(feats, rois_b, out_size=7,
                    featmap_strides=(4, 8, 16, 32), sampling_ratio=2,
                    finest_scale=56, aligned=True):
    """Chunk-grid x-first batched multi-level RoIAlign (inference).

    Same signature/semantics as
    :func:`aidet_tpu.ops.roi_align_pallas.roi_align_pallas`.
    """
    from .roi_align_pallas import _prepare, _weights_1d

    feats = list(feats)
    if feats[-1].shape[1] > BAND_H:  # x is full-width by construction
        # a coarsest level taller than one band cannot guarantee the
        # forced-fit rois' 1-D y weights stay inside the 48-row band
        # (spans > BAND_H - BAND_S rows starting late in a band
        # overflow) — XLA fallback for img_size > 1536
        from .roi_align import batched_multilevel_roi_align
        return batched_multilevel_roi_align(
            feats, rois_b, out_size=out_size,
            featmap_strides=tuple(featmap_strides),
            sampling_ratio=sampling_ratio, finest_scale=finest_scale,
            aligned=aligned)
    num_levels = len(featmap_strides)
    b, r = rois_b.shape[:2]
    k = b * r
    c = feats[0].shape[-1]
    s = sampling_ratio
    hs = [f.shape[1] for f in feats]
    ws = [f.shape[2] for f in feats]
    # pad heights to multiples of 16 so every band offset (band_id*16
    # or the tail clamp hp-48) is 16-aligned — Mosaic needs the dynamic
    # dim-2 DMA offset provably divisible by the sublane tile (8)
    hps = [-(-h // 16) * 16 for h in hs]
    rows_l = tuple(min(BAND_H, h) for h in hps)
    wpad = max(ws)
    chunk = _chunk_size(out_size)

    (cls_ids, b_idx, wy, _wx, ys, xs, h_l, w_l) = _prepare(
        feats, rois_b, out_size, featmap_strides, sampling_ratio,
        finest_scale, aligned, use_small=False, with_coords=True)
    lvls = cls_ids // 2

    # band assignment + chunk grouping by (image, level, band); all
    # row0 values are multiples of 16 (BAND_S=16, hp%16==0)
    rows_arr = jnp.asarray(rows_l, jnp.int32)[lvls]
    hp_arr = jnp.asarray(hps, jnp.int32)[lvls]
    band_id = wy // BAND_S
    row0 = jnp.minimum(band_id * BAND_S,
                       jnp.maximum(hp_arr - rows_arr, 0))
    max_bands = max(hps) // BAND_S + 1
    key = (b_idx * num_levels + lvls) * max_bands + band_id
    perm = jnp.argsort(key, stable=True)
    inv = jnp.argsort(perm, stable=True)

    key_s = key[perm]
    ar = jnp.arange(k, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), key_s[1:] != key_s[:-1]])
    start_cum = jax.lax.cummax(jnp.where(is_start, ar, 0))
    idx_in_group = ar - start_cum
    new_chunk = is_start | (idx_in_group % chunk == 0)
    chunk_id = jnp.cumsum(new_chunk.astype(jnp.int32)) - 1
    slot = idx_in_group % chunk
    pos = chunk_id * chunk + slot                     # strictly increasing

    # static chunk-count bound: full chunks + one partial per group
    g_max = b * sum(-(-h // BAND_S) for h in hps)
    n_chunks = -(-k // chunk) + g_max
    kp = n_chunks * chunk

    # per-roi 1-D weights on the sorted order: y band-relative, x
    # full-width (origin 0) — columns beyond a narrow level are zero
    # because sample coords are clamped to w_l - 1
    ys_s, xs_s = ys[perm], xs[perm]
    h_s, w_s = h_l[perm], w_l[perm]
    row0_s = row0[perm]
    wy_c = _weights_1d(ys_s, row0_s, h_s, BAND_H, out_size, s)
    wx_c = _weights_1d(xs_s, jnp.zeros_like(row0_s), w_s, wpad,
                       out_size, s)
    wdt = jnp.bfloat16 if feats[0].dtype == jnp.bfloat16 else jnp.float32
    wx_all = jnp.zeros((kp, out_size, wpad), wdt).at[pos].set(
        wx_c.astype(wdt), unique_indices=True)
    wy_all = jnp.zeros((kp, out_size, BAND_H), wdt).at[pos].set(
        wy_c.astype(wdt), unique_indices=True)
    wx_all = wx_all.reshape(n_chunks, chunk * out_size, wpad)
    wy_all = wy_all.reshape(n_chunks, chunk * out_size, BAND_H)

    # per-chunk scalars from the chunk's first roi (tail chunks clamp
    # to the last roi: same key → no reload, zero weights → zero out)
    starts = jnp.clip(
        jnp.searchsorted(pos, jnp.arange(n_chunks, dtype=jnp.int32)
                         * chunk), 0, k - 1)
    key_ck = key_s[starts]
    b_ck = b_idx[perm][starts]
    lvl_ck = lvls[perm][starts]
    row0_ck = row0_s[starts]

    # x-major pyramid (one XLA transpose pass), H padded to 16 — a
    # no-op for the usual 512/1024 inputs whose level heights are
    # already multiples of 16
    xposed = [
        jnp.pad(jnp.swapaxes(f, 1, 2),
                ((0, 0), (0, 0), (0, hp - h), (0, 0)))
        if hp != h else jnp.swapaxes(f, 1, 2)
        for f, h, hp in zip(feats, hs, hps)]

    csplit = 1
    while (wpad * BAND_H * c * 2
           + chunk * out_size * BAND_H * (c // csplit) * 6) > 11_000_000:
        csplit *= 2
    while c % csplit:
        csplit //= 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # key, b, lvl, row0
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * num_levels
        + [pl.BlockSpec((1, chunk * out_size, wpad),
                        lambda i, *_: (i, 0, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((1, chunk * out_size, BAND_H),
                        lambda i, *_: (i, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (chunk, out_size, out_size, c),
            lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((wpad, BAND_H, c), feats[0].dtype),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ])

    out = pl.pallas_call(
        functools.partial(_kernel, num_levels, out_size, c, csplit,
                          rows_l, ws, chunk, wpad),
        out_shape=jax.ShapeDtypeStruct(
            (kp, out_size, out_size, c), feats[0].dtype),
        grid_spec=grid_spec,
        interpret=os.environ.get("AIDET_BANDX_INTERPRET", "0") == "1",
    )(key_ck.astype(jnp.int32), b_ck.astype(jnp.int32),
      lvl_ck.astype(jnp.int32), (row0_ck // 8).astype(jnp.int32),
      *xposed, wx_all, wy_all)
    # sorted rois live at `pos`; one fused gather maps each original
    # roi to its chunk slot (out[pos][inv] would gather ~100MB twice)
    return out[pos[inv]].reshape(b, r, out_size, out_size, c)
