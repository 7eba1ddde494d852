"""On-device image normalization.

The reference normalizes on the host inside the data pipeline
(`Normalize`, mmdet/datasets/pipelines/transforms.py:405-433) and ships
float32 tensors to the device.  On TPU the host->device link is the
train loop's bottleneck (a 1024x1024x3 float32 image is 12.6 MB vs
3.1 MB as uint8), so the TPU-native layout ships raw uint8 pixels and
folds `(x - mean) / std` (+ BGR->RGB) into the jitted step, where XLA
fuses it into the first convolution's input read for free.

Contract: a detector whose `img_norm` is consulted here accepts EITHER
pre-normalized float inputs (host pipeline, unchanged semantics) or
raw uint8 BGR inputs (device_normalize pipelines) — dispatch is on the
input dtype, which is static under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

# ImageNet statistics in BGR-file order convention: mean/std are
# expressed for the RGB image AFTER the to_rgb channel flip (matches
# data/pipeline.py IMAGENET_MEAN/STD and every reference config's
# img_norm_cfg)
DEFAULT_MEAN = (123.675, 116.28, 103.53)
DEFAULT_STD = (58.395, 57.12, 57.375)


def device_normalize(imgs, img_norm=None, dtype=jnp.float32):
    """Normalize uint8 [B, H, W, 3] BGR images on device; pass floats
    through untouched (already normalized by the host pipeline)."""
    if imgs.dtype != jnp.uint8:
        return imgs
    cfg = dict(img_norm or {})
    mean = jnp.asarray(cfg.get("mean", DEFAULT_MEAN), jnp.float32)
    std = jnp.asarray(cfg.get("std", DEFAULT_STD), jnp.float32)
    x = imgs[..., ::-1] if cfg.get("to_rgb", True) else imgs
    # f32 math first (identical to the host pipeline), cast to the
    # model compute dtype last
    out = (x.astype(jnp.float32) - mean) / std
    return out.astype(dtype)
