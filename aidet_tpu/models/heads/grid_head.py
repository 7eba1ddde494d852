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


def _neighbor_edges(grid_points: int):
    """Directed (dst, src) 4-neighbour edges of the row-major point
    lattice (grid_head.py:90-107; ordering is isomorphic)."""
    side = int(grid_points ** 0.5)
    edges = []
    for p in range(grid_points):
        iy, ix = divmod(p, side)
        if ix > 0:
            edges.append((p, p - 1))
        if iy > 0:
            edges.append((p, p - side))
        if iy < side - 1:
            edges.append((p, p + side))
        if ix < side - 1:
            edges.append((p, p + 1))
    return edges


def _grouped_deconv2x(x, kernel, groups: int, kernel_size: int = 4):
    """Grouped stride-2 transposed conv via lhs-dilated conv (flax
    ConvTranspose has no feature_group_count; lax does).

    x: [N, H, W, G*cin]; kernel: [k, k, cin, cout_total] → [N, 2H, 2W,
    cout_total]. Equivalent to torch ConvTranspose2d(k=4, stride=2,
    padding=1, groups=G)."""
    pad = kernel_size - 1 - (kernel_size - 2) // 2
    return jax.lax.conv_general_dilated(
        x, kernel[::-1, ::-1], window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)], lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)


@HEADS.register
class GridHead(nn.Module):
    """Grid R-CNN Plus head with point-pair feature fusion
    (grid_head.py:55-186).

    Trunk convs produce per-point feature groups; first- and
    second-order fusion pass each point's features through per-edge
    (5x5 depthwise + 1x1) transitions and sum them into the 4
    neighbours — here batched as ONE depthwise conv + ONE grouped 1x1
    over all edges, with a one-hot scatter matmul (no per-edge Python
    modules). Two grouped 2x deconvs emit the heatmaps; the unfused
    trunk shares the deconvs for the auxiliary training loss."""
    grid_points: int = 9
    num_convs: int = 8
    in_channels: int = 256
    point_feat_channels: int = 64
    norm_groups: int = 36
    fusion: bool = True
    dtype: jnp.dtype = jnp.float32

    @property
    def conv_out_channels(self):
        return self.grid_points * self.point_feat_channels

    def _edge_fuse(self, xp, src, n_pts, name):
        """xp [N, H, W, P, c] gathered at src edges → per-edge
        depthwise 5x5 + grouped 1x1 → scatter-sum to dst."""
        e = len(src)
        c = self.point_feat_channels
        g = xp[..., jnp.asarray(src), :]
        g = g.reshape(g.shape[:3] + (e * c,))
        g = nn.Conv(e * c, (5, 5), padding=2, feature_group_count=e * c,
                    dtype=self.dtype, name=f"{name}_dw")(g)
        g = nn.Conv(e * c, (1, 1), feature_group_count=e,
                    dtype=self.dtype, name=f"{name}_pw")(g)
        return g.reshape(g.shape[:3] + (e, c))

    @nn.compact
    def __call__(self, x, return_unfused: bool = False):
        """x: [N, s, s, C] → grid heatmaps [N, 2s, 2s, grid_points]
        (trunk downsamples 2x, two deconvs upsample 4x)."""
        p_pts = self.grid_points
        c = self.point_feat_channels
        cout = self.conv_out_channels
        for i in range(self.num_convs):
            stride = 2 if i == 0 else 1
            x = nn.relu(nn.GroupNorm(num_groups=self.norm_groups)(
                nn.Conv(cout, (3, 3), strides=(stride, stride),
                        padding=1, dtype=self.dtype,
                        name=f"conv{i}")(x)))

        if self.fusion:
            edges = _neighbor_edges(p_pts)
            src = [e[1] for e in edges]
            dst = [e[0] for e in edges]
            scatter = jax.nn.one_hot(jnp.asarray(dst), p_pts,
                                     dtype=x.dtype)       # [E, P]
            xp = x.reshape(x.shape[:3] + (p_pts, c))
            fo = self._edge_fuse(xp, src, p_pts, "forder")
            x_fo = xp + jnp.einsum("...ec,ep->...pc", fo, scatter)
            so = self._edge_fuse(x_fo, src, p_pts, "sorder")
            x_so = xp + jnp.einsum("...ec,ep->...pc", so, scatter)
            fused = x_so.reshape(x.shape[:3] + (cout,))
        else:
            fused = x

        k1 = self.param("deconv1_kernel", nn.initializers.normal(1e-3),
                        (4, 4, c, cout), self.dtype)
        b1 = self.param("deconv1_bias", nn.initializers.zeros, (cout,),
                        self.dtype)
        k2 = self.param("deconv2_kernel", nn.initializers.normal(1e-3),
                        (4, 4, c, p_pts), self.dtype)
        # bias init -log(0.99/0.01): rare-positive heatmap prior
        b2 = self.param("deconv2_bias",
                        nn.initializers.constant(-4.59511985),
                        (p_pts,), self.dtype)
        gn = nn.GroupNorm(num_groups=p_pts, name="deconv_norm")

        def decode(feat):
            h = _grouped_deconv2x(feat, k1, p_pts) + b1
            h = nn.relu(gn(h))
            return _grouped_deconv2x(h, k2, p_pts) + b2

        heat = decode(fused)
        if return_unfused:
            return heat, decode(x)
        return heat


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
