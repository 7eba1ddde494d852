"""Deformable convolution v1/v2 — TPU-native formulation.

Replaces the reference's CUDA pair (mmdet/ops/dcn/src/
deform_conv_cuda*.cu, deform_pool_cuda*.cu + python wrappers
mmdet/ops/dcn/deform_conv.py): instead of a hand-written
im2col-with-offsets kernel, the sampled patch tensor is built with
vectorized bilinear gathers and contracted with the weight on the MXU
— the exact decomposition the CUDA kernel performs, but XLA-fusable
and autodiff-complete (the backward is gather-transpose scatter-adds).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _bilinear(img, ys, xs):
    """img [H, W, C]; ys/xs [...]: bilinear sample, 0 outside."""
    h, w = img.shape[0], img.shape[1]
    oob = (ys <= -1.0) | (ys >= h) | (xs <= -1.0) | (xs >= w)
    y = jnp.clip(ys, 0.0, h - 1)
    x = jnp.clip(xs, 0.0, w - 1)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = (y - y0)[..., None]
    lx = (x - x0)[..., None]
    y0i, x0i = y0.astype(jnp.int32), x0.astype(jnp.int32)
    y1i, x1i = y1.astype(jnp.int32), x1.astype(jnp.int32)
    v = (img[y0i, x0i] * (1 - ly) * (1 - lx)
         + img[y0i, x1i] * (1 - ly) * lx
         + img[y1i, x0i] * ly * (1 - lx)
         + img[y1i, x1i] * ly * lx)
    return jnp.where(oob[..., None], 0.0, v)


def deform_conv2d(x, offset, weight, mask=None, stride=1, padding=1,
                  dilation=1):
    """Deformable conv on one image.

    Args:
      x: [H, W, Cin]; offset: [Ho, Wo, 2*kh*kw] (dy, dx per tap,
        ordered tap-major like the reference kernels);
      weight: [kh, kw, Cin, Cout]; mask: optional [Ho, Wo, kh*kw]
        modulation (DCNv2).
    Returns [Ho, Wo, Cout].
    """
    kh, kw, cin, cout = weight.shape
    ho = (x.shape[0] + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (x.shape[1] + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    base_y = (jnp.arange(ho) * stride - padding).astype(jnp.float32)
    base_x = (jnp.arange(wo) * stride - padding).astype(jnp.float32)
    tap_y = (jnp.arange(kh) * dilation).astype(jnp.float32)
    tap_x = (jnp.arange(kw) * dilation).astype(jnp.float32)

    off = offset.reshape(ho, wo, kh * kw, 2)
    dy = off[..., 0]
    dx = off[..., 1]
    yy = (base_y[:, None, None] + jnp.tile(
        jnp.repeat(tap_y, kw), 1)[None, None, :]) + dy   # [Ho, Wo, K]
    xx = (base_x[None, :, None] + jnp.tile(tap_x, kh)[None, None, :]) + dx

    patches = _bilinear(x, yy, xx)                        # [Ho, Wo, K, Cin]
    if mask is not None:
        patches = patches * mask[..., None]
    w_flat = weight.reshape(kh * kw * cin, cout)
    return patches.reshape(ho, wo, kh * kw * cin) @ w_flat


class DeformConv2d(nn.Module):
    """DCNv1 layer with learned offsets (DeformConvPack parity,
    mmdet/ops/dcn/deform_conv.py DeformConvPack)."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    modulated: bool = False        # True → DCNv2 (ModulatedDeformConvPack)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, C] → [B, Ho, Wo, features]."""
        k = self.kernel_size
        n_off = 2 * k * k + (k * k if self.modulated else 0)
        off_out = nn.Conv(n_off, (k, k), strides=(self.stride,) * 2,
                          padding=self.padding,
                          kernel_dilation=(self.dilation,) * 2,
                          kernel_init=nn.initializers.zeros,
                          dtype=self.dtype, name="conv_offset")(x)
        weight = self.param(
            "kernel", nn.initializers.he_normal(),
            (k, k, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.modulated:
            offset = off_out[..., :2 * k * k]
            mask = jax.nn.sigmoid(off_out[..., 2 * k * k:])
        else:
            offset = off_out
            mask = None

        def one(img, off, m):
            return deform_conv2d(img, off, weight, m, self.stride,
                                 self.padding, self.dilation)
        if mask is None:
            out = jax.vmap(lambda i, o: one(i, o, None))(x, offset)
        else:
            out = jax.vmap(one)(x, offset, mask)
        return out + bias
