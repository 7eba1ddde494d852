"""CARAFE content-aware upsampling (pure XLA).

Replaces mmdet/ops/carafe/src/carafe_cuda*.cu + carafe.py (CARAFE /
CARAFEPack): the kernel-prediction branch emits per-output-pixel
reassembly kernels; features are reassembled as patch-extract ×
predicted-kernel einsum — fully fused by XLA, no custom kernel needed.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def carafe(x, kernels, up_factor: int = 2, k_up: int = 5):
    """Reassemble-upsample one batch of features.

    Args:
      x: [B, H, W, C]; kernels: [B, H*up, W*up, k_up*k_up], already
        softmax-normalized over the last dim.
    Returns [B, H*up, W*up, C].
    """
    b, h, w, c = x.shape
    pad = k_up // 2
    # extract k_up x k_up patches around each source pixel → [B,H,W,K,C]
    patches = jax.lax.conv_general_dilated_patches(
        x, (k_up, k_up), (1, 1),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # conv_..._patches returns channels as C*K (channel-major);
    # reorder to [B, H, W, K, C]
    patches = patches.reshape(b, h, w, c, k_up * k_up)
    patches = jnp.swapaxes(patches, -1, -2)

    # each upsampled pixel (i, j) reads source pixel (i//up, j//up)
    kern = kernels.reshape(b, h, up_factor, w, up_factor, k_up * k_up)
    out = jnp.einsum("bhwkc,bhuwvk->bhuwvc", patches, kern)
    return out.reshape(b, h * up_factor, w * up_factor, c)


class CARAFEPack(nn.Module):
    """Kernel-prediction + reassembly (CARAFEPack parity)."""
    channels: int
    up_factor: int = 2
    k_up: int = 5
    k_enc: int = 3
    compressed_channels: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        up = self.up_factor
        comp = nn.Conv(self.compressed_channels, (1, 1),
                       dtype=self.dtype, name="channel_compressor")(x)
        enc = nn.Conv(up * up * self.k_up * self.k_up,
                      (self.k_enc, self.k_enc),
                      padding=self.k_enc // 2, dtype=self.dtype,
                      name="content_encoder")(comp)
        b, h, w, _ = enc.shape
        # pixel-shuffle the up² kernel groups to the upsampled grid
        kern = enc.reshape(b, h, w, up, up, self.k_up * self.k_up)
        kern = kern.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, h * up, w * up, self.k_up * self.k_up)
        kern = jax.nn.softmax(kern, axis=-1)
        return carafe(x, kern, up, self.k_up)
