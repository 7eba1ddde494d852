"""Plug-in feature modules (parity: mmdet/ops/{context_block.py,
non_local.py, conv_ws.py, generalized_attention.py, scale.py}):
GCNet context block, non-local 2D, weight-standardised conv, scale."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class ContextBlock(nn.Module):
    """GCNet global-context block."""
    ratio: float = 1.0 / 16
    pooling_type: str = "att"        # 'att' | 'avg'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        planes = max(int(c * self.ratio), 1)
        if self.pooling_type == "att":
            att = nn.Conv(1, (1, 1), dtype=self.dtype,
                          name="conv_mask")(x)           # [B,H,W,1]
            att = jax.nn.softmax(att.reshape(b, h * w, 1), axis=1)
            ctx = jnp.einsum("bnc,bnk->bkc", x.reshape(b, h * w, c), att)
            ctx = ctx.reshape(b, 1, 1, c)
        else:
            ctx = x.mean(axis=(1, 2), keepdims=True)
        t = nn.Conv(planes, (1, 1), dtype=self.dtype,
                    name="channel_add_conv1")(ctx)
        t = nn.LayerNorm(dtype=self.dtype, name="ln")(t)
        t = nn.relu(t)
        t = nn.Conv(c, (1, 1), dtype=self.dtype,
                    name="channel_add_conv2",
                    kernel_init=nn.initializers.zeros)(t)
        return x + t


class NonLocal2D(nn.Module):
    """Non-local block (embedded gaussian)."""
    reduction: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        inter = max(c // self.reduction, 1)
        theta = nn.Conv(inter, (1, 1), dtype=self.dtype,
                        name="theta")(x).reshape(b, h * w, inter)
        phi = nn.Conv(inter, (1, 1), dtype=self.dtype,
                      name="phi")(x).reshape(b, h * w, inter)
        g = nn.Conv(inter, (1, 1), dtype=self.dtype,
                    name="g")(x).reshape(b, h * w, inter)
        att = jax.nn.softmax(
            jnp.einsum("bnc,bmc->bnm", theta, phi), axis=-1)
        y = jnp.einsum("bnm,bmc->bnc", att, g).reshape(b, h, w, inter)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="conv_out",
                    kernel_init=nn.initializers.zeros)(y)
        return x + y


class ConvWS(nn.Module):
    """Weight-standardised conv (for GN configs)."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            (k, k, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = kernel.mean(axis=(0, 1, 2), keepdims=True)
        std = kernel.std(axis=(0, 1, 2), keepdims=True) + 1e-5
        kernel = (kernel - mean) / std
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            (self.stride, self.stride),
            [(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + bias


class Scale(nn.Module):
    """Learnable scalar multiplier (mmdet/ops/scale.py)."""
    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        s = self.param("scale",
                       nn.initializers.constant(self.init_value), ())
        return x * s
