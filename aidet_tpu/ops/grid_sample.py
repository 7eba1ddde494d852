"""Grid sampling + affine grids.

Replaces the reference's backported CUDA/CPU kernels
(mmdet/ops/grid_sampler/*, mmdet/ops/affine_grid/*): plain vectorized
bilinear gathers; align_corners semantics selectable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def affine_grid(theta: jax.Array, size, align_corners: bool = False):
    """Sampling grid from 2x3 affine matrices.

    Args:
      theta: [B, 2, 3]; size: (B, H, W).
    Returns grid [B, H, W, 2] of normalized (x, y) in [-1, 1].
    """
    b, h, w = size
    if align_corners:
        xs = jnp.linspace(-1.0, 1.0, w)
        ys = jnp.linspace(-1.0, 1.0, h)
    else:
        xs = (jnp.arange(w) + 0.5) * 2.0 / w - 1.0
        ys = (jnp.arange(h) + 0.5) * 2.0 / h - 1.0
    gx, gy = jnp.meshgrid(xs, ys)
    ones = jnp.ones_like(gx)
    base = jnp.stack([gx, gy, ones], -1)           # [H, W, 3]
    return jnp.einsum("hwk,bjk->bhwj", base, theta)


def grid_sample(x: jax.Array, grid: jax.Array,
                align_corners: bool = False,
                padding_mode: str = "zeros"):
    """Bilinear sampling of x at normalized grid positions.

    Args:
      x: [B, H, W, C]; grid: [B, Ho, Wo, 2] with (x, y) in [-1, 1].
    Returns [B, Ho, Wo, C].
    """
    h, w = x.shape[1], x.shape[2]
    gx = grid[..., 0]
    gy = grid[..., 1]
    if align_corners:
        fx = (gx + 1.0) * (w - 1) / 2.0
        fy = (gy + 1.0) * (h - 1) / 2.0
    else:
        fx = ((gx + 1.0) * w - 1.0) / 2.0
        fy = ((gy + 1.0) * h - 1.0) / 2.0

    def sample_one(img, ys, xs):
        if padding_mode == "border":
            y = jnp.clip(ys, 0.0, h - 1)
            xc = jnp.clip(xs, 0.0, w - 1)
            y0 = jnp.floor(y)
            x0 = jnp.floor(xc)
            y1 = jnp.minimum(y0 + 1, h - 1)
            x1 = jnp.minimum(x0 + 1, w - 1)
            ly = (y - y0)[..., None]
            lx = (xc - x0)[..., None]
            y0i, x0i = y0.astype(jnp.int32), x0.astype(jnp.int32)
            y1i, x1i = y1.astype(jnp.int32), x1.astype(jnp.int32)
            return (img[y0i, x0i] * (1 - ly) * (1 - lx)
                    + img[y0i, x1i] * (1 - ly) * lx
                    + img[y1i, x0i] * ly * (1 - lx)
                    + img[y1i, x1i] * ly * lx)
        # zeros: true bilinear-with-zero-padding (torch grid_sampler
        # parity) — each tap outside the image contributes 0, so the
        # value FADES linearly to 0 across the border instead of
        # holding the border value and dropping discontinuously
        y0 = jnp.floor(ys)
        x0 = jnp.floor(xs)
        ly = (ys - y0)[..., None]
        lx = (xs - x0)[..., None]

        def tap(yi, xi):
            valid = ((yi >= 0) & (yi <= h - 1)
                     & (xi >= 0) & (xi <= w - 1))
            yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            return img[yc, xc] * valid[..., None]

        return (tap(y0, x0) * (1 - ly) * (1 - lx)
                + tap(y0, x0 + 1) * (1 - ly) * lx
                + tap(y0 + 1, x0) * ly * (1 - lx)
                + tap(y0 + 1, x0 + 1) * ly * lx)

    return jax.vmap(sample_one)(x, fy, fx)


def masked_conv2d(x, mask, weight, bias=None, padding: int = 1):
    """Conv evaluated only where mask > 0 (parity: mmdet/ops/
    masked_conv — dense conv × mask is numerically identical; on TPU
    dense compute is the fast path anyway)."""
    out = jax.lax.conv_general_dilated(
        x, weight, (1, 1), [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        out = out + bias
    return out * (mask > 0).astype(out.dtype)
