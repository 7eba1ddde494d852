"""Grid head + Grid R-CNN (parity: mmdet/models/mask_heads/
grid_head.py + detectors/grid_rcnn.py): regression is replaced by a
heatmap of 9 grid points per roi; boxes are recovered from the argmax
locations of the (whole-map-supervised) grid heatmaps."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import HEADS


@HEADS.register
class GridHead(nn.Module):
    grid_points: int = 9
    num_convs: int = 8
    in_channels: int = 256
    conv_out_channels: int = 256   # reference uses 576; configurable
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: [N, s, s, C] → grid heatmaps [N, 2s, 2s, grid_points]."""
        for i in range(self.num_convs):
            x = nn.relu(nn.GroupNorm(num_groups=4)(
                nn.Conv(self.conv_out_channels, (3, 3), padding=1,
                        dtype=self.dtype, name=f"conv{i}")(x)))
        x = nn.relu(nn.ConvTranspose(self.conv_out_channels, (2, 2),
                                     strides=(2, 2), dtype=self.dtype,
                                     name="deconv1")(x))
        return nn.Conv(self.grid_points, (1, 1), dtype=self.dtype,
                       name="grid_logits")(x)


def grid_target(sample, rois, gt_boxes, heatmap_size: int = 14,
                grid_points: int = 9, sigma: float = 1.0):
    """Gaussian grid-point heatmap targets for positive rois.

    Parity: GridHead.get_target: the 3x3 grid points of the matched gt
    box, rendered as gaussians in roi-relative coordinates.
    """
    g = gt_boxes.shape[0]
    safe = jnp.clip(sample.gt_inds, 0, g - 1)
    gt = gt_boxes[safe]                        # [R, 4]
    side = int(grid_points ** 0.5)
    fr = jnp.linspace(0.0, 1.0, side)
    gx = gt[:, 0:1] + fr[None] * (gt[:, 2:3] - gt[:, 0:1])   # [R, 3]
    gy = gt[:, 1:2] + fr[None] * (gt[:, 3:4] - gt[:, 1:2])
    # grid point k = (iy, ix): x-major pairing
    px = jnp.tile(gx, (1, side))                              # [R, 9]
    py = jnp.repeat(gy, side, axis=1)

    x1, y1 = rois[:, 0:1], rois[:, 1:2]
    w = jnp.maximum(rois[:, 2:3] - rois[:, 0:1], 1.0)
    h = jnp.maximum(rois[:, 3:4] - rois[:, 1:2], 1.0)
    # grid-point coords on the 0..S-1 heatmap lattice so the roi's own
    # corners land exactly on the border pixels
    u = (px - x1) / w * (heatmap_size - 1)                    # [R, 9]
    v = (py - y1) / h * (heatmap_size - 1)

    ii = jnp.arange(heatmap_size, dtype=jnp.float32)
    dy = ii[None, :, None, None] - v[:, None, None, :]        # [R,S,1,9]
    dx = ii[None, None, :, None] - u[:, None, None, :]        # [R,1,S,9]
    heat = jnp.exp(-(dx ** 2 + dy ** 2) / (2 * sigma ** 2))
    inside = ((u >= 0) & (u <= heatmap_size - 1)
              & (v >= 0) & (v <= heatmap_size - 1))           # [R, 9]
    heat = heat * inside[:, None, None, :]
    return heat * sample.is_pos[:, None, None, None]


def grid_to_boxes(heatmaps, rois):
    """Recover boxes from grid heatmaps (GridHead.get_bboxes).

    Args:
      heatmaps: [K, S, S, 9]; rois: [K, 4].
    Returns refined boxes [K, 4]: min/max over the argmax grid points.
    """
    k, s = heatmaps.shape[0], heatmaps.shape[1]
    flat = heatmaps.reshape(k, s * s, -1)
    idx = flat.argmax(1)                       # [K, 9]
    vy = (idx // s).astype(jnp.float32)
    vx = (idx % s).astype(jnp.float32)
    x1, y1 = rois[:, 0:1], rois[:, 1:2]
    w = jnp.maximum(rois[:, 2:3] - rois[:, 0:1], 1.0)
    h = jnp.maximum(rois[:, 3:4] - rois[:, 1:2], 1.0)
    gx = x1 + vx / (s - 1) * w                 # [K, 9]
    gy = y1 + vy / (s - 1) * h
    return jnp.stack([gx.min(1), gy.min(1), gx.max(1), gy.max(1)], -1)
