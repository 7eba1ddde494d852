"""Fused ResNet bottleneck chains (Pallas, TPU).

XLA runs each bottleneck as 3 convs + elementwise glue, spilling every
intermediate activation to HBM; at detection resolutions (1024^2 input,
stride-4/8 stages) the identity blocks of layer1/layer2 are memory-bound
~3x off their MXU roofline (measured v5e: layer1 10.6 ms vs ~3.4 ms
compute floor at batch 16).  This kernel runs a whole chain of stride-1
identity bottlenecks (conv1x1-bn-relu -> conv3x3-bn-relu -> conv1x1-bn
-> +residual -> relu, parity mmdet/models/backbones/resnet.py
Bottleneck.forward) over row strips held in VMEM: HBM traffic drops to
one read of x plus one write of the result, with a k-row halo per
3x3 in the chain.

Layout: NHWC bf16, BN pre-folded to (scale, bias) in f32
(FrozenBN semantics: stats are constants).  Each grid step processes a
[T, W] strip of one image; all compute keeps the fixed padded buffer
shape [T+2k, Wp] where the junk frontier advances one row/col per block
and the final crop discards it (columns are real zero-padding at the
image border, so only strip-top/bottom rows are ever junk).

Backward runs the XLA reference implementation through jax.vjp
(identical math, so gradients are exact for the fused function).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn(scale, bias, mean, var, eps=1e-5):
    """FrozenBN -> (eff_scale, eff_bias), f32 (resnet.py FrozenBN)."""
    inv = jax.lax.rsqrt(var + eps)
    return scale * inv, bias - mean * inv * scale


def bottleneck_chain_ref(x, w1, s1, b1, w2, s2, b2, w3, s3, b3):
    """XLA reference: k stride-1 identity bottlenecks with folded BN.

    Shapes: x [B,H,W,C]; w1 [k,C,Cm]; w2 [k,3,3,Cm,Cm]; w3 [k,Cm,C];
    s*/b* [k, .] f32.  Matches the flax Bottleneck path bit-for-bit in
    structure (bf16 convs, f32 scale/bias applied in bf16).
    """
    k = w1.shape[0]
    dt = x.dtype
    for j in range(k):
        y = jnp.einsum("bhwc,cm->bhwm", x, w1[j])
        y = jnp.maximum(y * s1[j].astype(dt) + b1[j].astype(dt), 0)
        y = jax.lax.conv_general_dilated(
            y, w2[j], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jnp.maximum(y * s2[j].astype(dt) + b2[j].astype(dt), 0)
        y = jnp.einsum("bhwm,mc->bhwc", y, w3[j])
        y = y * s3[j].astype(dt) + b3[j].astype(dt)
        x = jnp.maximum(y + x, 0)
    return x


# left column margin for strip buffers: DMA column offsets must be
# sublane-tile aligned (16 for bf16), so the image data lives at cols
# [MARGIN, MARGIN + W) with >= kernel-halo zeros on both sides
MARGIN = 16


def load_strip(x_ref, b, s, S, T, k, W, xbuf, sem):
    """DMA rows [s*T - k, s*T + T + k) of image ``b`` of x_ref
    [B, H, W, C] into ``xbuf`` [T+2k, >=MARGIN+W+k, C] at column offset
    MARGIN, zero-filling halo rows/cols that fall outside the image.
    Shared by the fused backbone/FPN/RPN strip kernels.  Synchronous.
    """
    r0 = s * T
    Tk = T + 2 * k
    L = MARGIN
    first = s == 0
    last = s == S - 1

    # column pads (left margin; right covers halo + lane round-up)
    xbuf[:, :L] = jnp.zeros_like(xbuf[:, :L])
    xbuf[:, L + W:] = jnp.zeros_like(xbuf[:, L + W:])

    @pl.when(first)
    def _():
        xbuf[:k, L:L + W] = jnp.zeros_like(xbuf[:k, L:L + W])

    @pl.when(last)
    def _():
        xbuf[k + T:, L:L + W] = jnp.zeros_like(xbuf[k + T:, L:L + W])

    # row range present in the image: [max(0, r0-k), min(H, r0+T+k));
    # branches are emitted only when the static grid lets them run (all
    # pl.when bodies are traced, so dead branches must not exist)
    if S == 1:
        cp = pltpu.make_async_copy(
            x_ref.at[b, pl.ds(0, T)],
            xbuf.at[pl.ds(k, T), pl.ds(L, W)], sem)
        cp.start()
        cp.wait()
    else:
        @pl.when(first)
        def _():
            cp = pltpu.make_async_copy(
                x_ref.at[b, pl.ds(0, T + k)],
                xbuf.at[pl.ds(k, T + k), pl.ds(L, W)], sem)
            cp.start()
            cp.wait()

        if S > 2:
            @pl.when(~first & ~last)
            def _():
                cp = pltpu.make_async_copy(
                    x_ref.at[b, pl.ds(r0 - k, Tk)],
                    xbuf.at[pl.ds(0, Tk), pl.ds(L, W)], sem)
                cp.start()
                cp.wait()

        @pl.when(last)
        def _():
            cp = pltpu.make_async_copy(
                x_ref.at[b, pl.ds(r0 - k, T + k)],
                xbuf.at[pl.ds(0, T + k), pl.ds(L, W)], sem)
            cp.start()
            cp.wait()


def frontier_mask(s, S, T, k, W, Wp, dt):
    """[T+2k, Wp, 1] multiplicative mask that zeroes buffer cells lying
    outside the image (conv SAME-padding must see zeros there, but
    fused 1x1+bias stages would write relu(bias))."""
    Tk = T + 2 * k
    first = s == 0
    last = s == S - 1
    # build in 3D: inserting a minor dim on a 16-bit value is not a
    # layout no-op and Mosaic rejects it
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (Tk, Wp, 1), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (Tk, Wp, 1), 1)
    rmin = jnp.where(first, k, 0)
    rmax = jnp.where(last, k + T, Tk)
    mask = ((row_ids >= rmin) & (row_ids < rmax)
            & (col_ids >= MARGIN) & (col_ids < MARGIN + W))
    return mask.astype(dt)


def _chunks(total, rows):
    """Static (start, size) row chunks covering [0, total)."""
    out = []
    a = 0
    while a < total:
        out.append((a, min(rows, total - a)))
        a += rows
    return out


def _chain_kernel(k, T, W, Wp, H, rA, rC,
                  x_ref, w1, s1, b1, w2, s2, b2, w3, s3, b3,
                  out_ref, xbuf, y1buf, y2buf, sem_in, sem_out):
    b = pl.program_id(0)
    s = pl.program_id(1)
    S = pl.num_programs(1)
    r0 = s * T
    Tk = T + 2 * k
    dt = xbuf.dtype
    C = xbuf.shape[2]
    Cm = y1buf.shape[2]

    load_strip(x_ref, b, s, S, T, k, W, xbuf, sem_in)

    # outside-image mask: mask y1 (conv2's input) and each block's
    # writeback so the zero-pad invariant survives chaining
    mask = frontier_mask(s, S, T, k, W, Wp, dt)

    # ---- k fused bottlenecks on the fixed [Tk, Wp] buffer -----------
    # every phase is row-chunked with 2D matmuls (Wp % 16 == 0 keeps
    # the [rows, Wp, C] -> [rows*Wp, C] collapse a layout no-op) so the
    # f32 transients stay small and strips can be large
    for j in range(k):
        for a, r in _chunks(Tk, rA):
            y = jax.lax.dot_general(
                xbuf[a:a + r].reshape(r * Wp, C), w1[j],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            y = jnp.maximum(y * s1[j] + b1[j], 0).astype(dt)
            y1buf[a:a + r] = y.reshape(r, Wp, Cm) * mask[a:a + r]
        for a, r in _chunks(Tk, rA):
            # 3x3 over y1 rows [a-1, a+r+1), zero row-pad at the strip
            # buffer edges, zero col-pad via the (1, 1) pad
            lo = max(a - 1, 0)
            hi = min(a + r + 1, Tk)
            yc = jnp.pad(y1buf[lo:hi],
                         ((1 - (a - lo), 1 - (hi - a - r)),
                          (1, 1), (0, 0)))
            acc = None
            for dy in range(3):
                for dx in range(3):
                    t = jax.lax.dot_general(
                        yc[dy:dy + r, dx:dx + Wp].reshape(r * Wp, Cm),
                        w2[j, dy, dx], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = t if acc is None else acc + t
            y2 = jnp.maximum(acc * s2[j] + b2[j], 0).astype(dt)
            y2buf[a:a + r] = y2.reshape(r, Wp, Cm)
        for a, r in _chunks(Tk, rC):
            y3 = jax.lax.dot_general(
                y2buf[a:a + r].reshape(r * Wp, Cm), w3[j],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            y3 = (y3 * s3[j] + b3[j]).astype(dt).reshape(r, Wp, C)
            xbuf[a:a + r] = (jnp.maximum(y3 + xbuf[a:a + r], 0)
                             * mask[a:a + r])

    cp = pltpu.make_async_copy(
        xbuf.at[pl.ds(k, T), pl.ds(MARGIN, W)],
        out_ref.at[b, pl.ds(r0, T)], sem_out)
    cp.start()
    cp.wait()


def _chain_pallas(x, w1, s1, b1, w2, s2, b2, w3, s3, b3,
                  strip=None, interpret=False):
    B, H, W, C = x.shape
    k = w1.shape[0]
    Cm = w1.shape[2]
    Wp = -((-(MARGIN + W + k)) // 16) * 16
    if strip is None:
        # VMEM budget: xbuf + y1buf + y2buf in bf16 ~<= 10M
        strip = max(8, min(H, (10 << 20) // (Wp * (C + 2 * Cm) * 2)))
        while H % strip:
            strip -= 1
    T = strip
    assert H % T == 0, (H, T)
    S = H // T
    Tk = T + 2 * k
    # f32 transient budget ~1.5M per phase
    rA = max(1, (3 << 19) // (Wp * Cm * 4))
    rC = max(1, (3 << 19) // (Wp * C * 4))

    grid_spec = pl.GridSpec(
        grid=(B, S),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((Tk, Wp, C), x.dtype),
            pltpu.VMEM((Tk, Wp, Cm), x.dtype),
            pltpu.VMEM((Tk, Wp, Cm), x.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        functools.partial(_chain_kernel, k, T, W, Wp, H, rA, rC),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(x, w1, s1, b1, w2, s2, b2, w3, s3, b3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def bottleneck_chain(x, weights, interpret=False):
    """Fused chain of k stride-1 identity bottlenecks.

    x: [B, H, W, C] (bf16 for the fast path); weights: tuple
    (w1 [k,C,Cm], s1, b1, w2 [k,3,3,Cm,Cm], s2, b2, w3 [k,Cm,C],
    s3 [k,C], b3 [k,C]) with BN pre-folded via fold_bn.
    """
    return _chain_pallas(x, *weights, interpret=interpret)


def _chain_fwd(x, weights, interpret=False):
    return bottleneck_chain(x, weights, interpret), (x, weights)


def _chain_bwd(interpret, res, g):
    x, weights = res
    _, vjp = jax.vjp(lambda xx, ww: bottleneck_chain_ref(xx, *ww),
                     x, weights)
    return vjp(g)


bottleneck_chain.defvjp(_chain_fwd, _chain_bwd)


def run_identity_chain(x, blocks, interpret=None):
    """Fold + stack per-block flax weights and run the fused chain.

    ``blocks``: list of (w1 [1,1,C,Cm], bn1, w2 [3,3,Cm,Cm], bn2,
    w3 [1,1,Cm,C], bn3) where bn* = (scale, bias, mean, var).
    """
    if interpret is None:          # off-TPU: run the Pallas interpreter
        from ..utils.platform import is_tpu_backend
        interpret = not is_tpu_backend()
    dt = x.dtype

    def fold(bn):
        return fold_bn(*bn)

    w1 = jnp.stack([b[0][0, 0].astype(dt) for b in blocks])
    w2 = jnp.stack([b[2].astype(dt) for b in blocks])
    w3 = jnp.stack([b[4][0, 0].astype(dt) for b in blocks])
    f1 = [fold(b[1]) for b in blocks]
    f2 = [fold(b[3]) for b in blocks]
    f3 = [fold(b[5]) for b in blocks]
    s1 = jnp.stack([f[0] for f in f1])
    b1 = jnp.stack([f[1] for f in f1])
    s2 = jnp.stack([f[0] for f in f2])
    b2 = jnp.stack([f[1] for f in f2])
    s3 = jnp.stack([f[0] for f in f3])
    b3 = jnp.stack([f[1] for f in f3])
    return bottleneck_chain(
        x, (w1, s1, b1, w2, s2, b2, w3, s3, b3), interpret)
