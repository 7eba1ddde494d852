"""Tests for deformable conv, CARAFE, grid sampling, masked conv."""

import jax
import jax.numpy as jnp
import numpy as np

from aidet_tpu.ops import (CARAFEPack, DeformConv2d, affine_grid, carafe,
                           deform_conv2d, grid_sample, masked_conv2d)


def test_deform_conv_zero_offset_equals_conv():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(9, 9, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32))
    offset = jnp.zeros((9, 9, 18))
    out = deform_conv2d(x, offset, w, stride=1, padding=1)
    ref = jax.lax.conv_general_dilated(
        x[None], w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


def test_deform_conv_integer_shift():
    # constant offset (0, 1) shifts sampling one pixel right: equals
    # plain conv applied to the shifted image
    rng = np.random.RandomState(1)
    x = np.zeros((8, 8, 1), np.float32)
    x[:, :7] = rng.randn(8, 7, 1)
    w = jnp.asarray(rng.randn(3, 3, 1, 2).astype(np.float32))
    offset = np.zeros((8, 8, 18), np.float32)
    offset[:, :, 1::2] = 1.0  # dx = +1 for every tap
    out = deform_conv2d(jnp.asarray(x), jnp.asarray(offset), w,
                        stride=1, padding=1)
    x_shift = np.roll(x, -1, axis=1)
    x_shift[:, -1] = 0
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x_shift)[None], w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    # borders differ (zero padding vs shifted content); compare interior
    np.testing.assert_allclose(np.asarray(out)[1:-1, 1:-2],
                               np.asarray(ref)[1:-1, 1:-2],
                               atol=1e-3, rtol=1e-3)


def test_deform_conv_module_and_grad():
    m = DeformConv2d(features=8, modulated=True)
    x = jnp.ones((2, 8, 8, 4))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(m.apply)(v, x)
    assert out.shape == (2, 8, 8, 8)
    g = jax.grad(lambda p: m.apply(p, x).sum())(v)
    assert all(bool(jnp.isfinite(t).all()) for t in jax.tree.leaves(g))


def test_carafe_uniform_kernel_is_interpolation():
    # a one-hot kernel centered on the source pixel copies it
    x = jnp.asarray(np.random.RandomState(2).randn(1, 4, 4, 3)
                    .astype(np.float32))
    k = np.zeros((1, 8, 8, 25), np.float32)
    k[..., 12] = 1.0  # center tap of 5x5
    out = carafe(x, jnp.asarray(k), up_factor=2, k_up=5)
    assert out.shape == (1, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(out)[0, ::2, ::2],
                               np.asarray(x)[0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out)[0, 1::2, 1::2],
                               np.asarray(x)[0], atol=1e-5)


def test_carafe_pack_module():
    m = CARAFEPack(channels=8, up_factor=2)
    x = jnp.ones((1, 6, 6, 8))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(m.apply)(v, x)
    assert out.shape == (1, 12, 12, 8)
    # softmax-normalized kernels on constant input → constant output
    # (interior only: border patches see the zero padding)
    np.testing.assert_allclose(np.asarray(out)[:, 4:-4, 4:-4], 1.0,
                               atol=1e-4)


def test_affine_grid_identity_and_sample():
    theta = jnp.asarray([[[1., 0., 0.], [0., 1., 0.]]])
    grid = affine_grid(theta, (1, 6, 6))
    x = jnp.asarray(np.random.RandomState(3).randn(1, 6, 6, 2)
                    .astype(np.float32))
    out = grid_sample(x, grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)


def test_grid_sample_translation():
    x = np.zeros((1, 8, 8, 1), np.float32)
    x[0, 2, 2, 0] = 1.0
    # shift sampling grid one pixel left → content appears one right
    theta = jnp.asarray([[[1., 0., -2.0 / 8], [0., 1., 0.]]])
    grid = affine_grid(theta, (1, 8, 8))
    out = np.asarray(grid_sample(jnp.asarray(x), grid))
    assert out[0, 2, 3, 0] > 0.9


def test_masked_conv():
    x = jnp.ones((1, 6, 6, 2))
    w = jnp.ones((3, 3, 2, 4))
    mask = jnp.zeros((1, 6, 6, 1)).at[0, 2:4, 2:4].set(1.0)
    out = np.asarray(masked_conv2d(x, mask, w))
    assert out[0, 3, 3].sum() > 0
    assert out[0, 0, 0].sum() == 0


def test_grid_sample_matches_torch_zeros_padding():
    """Torch-parity of padding_mode='zeros': taps outside the image
    contribute 0, so values fade linearly across the border (the old
    impl clamped, holding the border value)."""
    import torch
    import torch.nn.functional as F
    rs = np.random.RandomState(0)
    x = rs.randn(2, 9, 11, 3).astype(np.float32)
    # grid straddling the borders on purpose
    gy, gx = np.meshgrid(np.linspace(-1.4, 1.4, 13),
                         np.linspace(-1.4, 1.4, 15), indexing="ij")
    grid = np.stack([gx, gy], -1).astype(np.float32)
    grid = np.tile(grid[None], (2, 1, 1, 1))
    for align in (False, True):
        ours = np.asarray(grid_sample(jnp.asarray(x), jnp.asarray(grid),
                                      align_corners=align))
        ref = F.grid_sample(torch.from_numpy(x).permute(0, 3, 1, 2),
                            torch.from_numpy(grid),
                            mode="bilinear", padding_mode="zeros",
                            align_corners=align)
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
