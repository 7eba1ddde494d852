"""Native C++ preprocessing library tests (vs numpy fallback)."""

import numpy as np
import pytest

from aidet_tpu import native
from aidet_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD


def test_native_builds_and_loads():
    assert native.native_available(), "native lib failed to build"


def test_normalize_pad_matches_numpy():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (37, 53, 3), np.uint8)
    out = native.normalize_pad(img, (64, 64), IMAGENET_MEAN, IMAGENET_STD)
    ref = np.zeros((64, 64, 3), np.float32)
    ref[:37, :53] = ((img.astype(np.float32)[..., ::-1] - IMAGENET_MEAN)
                     / IMAGENET_STD)
    np.testing.assert_allclose(out, ref, atol=1e-5)
    assert (out[37:] == 0).all() and (out[:, 53:] == 0).all()


def test_tile_scene_normalized_matches_numpy():
    rng = np.random.RandomState(1)
    scene = rng.randint(0, 255, (300, 400, 3), np.uint8)
    offs = np.array([[0, 0], [200, 100], [350, 250]], np.int32)
    out = native.tile_scene_normalized(scene, offs, 128,
                                       IMAGENET_MEAN, IMAGENET_STD)
    assert out.shape == (3, 128, 128, 3)
    for i, (ox, oy) in enumerate(offs):
        tile = scene[oy:oy + 128, ox:ox + 128]
        ref = ((tile.astype(np.float32)[..., ::-1] - IMAGENET_MEAN)
               / IMAGENET_STD)
        np.testing.assert_allclose(out[i, :tile.shape[0], :tile.shape[1]],
                                   ref, atol=1e-5)
        # padding beyond scene is zero
        if tile.shape[0] < 128:
            assert (out[i, tile.shape[0]:] == 0).all()


def test_native_throughput_sanity():
    # not a benchmark, just verifies the multithreaded path handles a
    # production-sized batch quickly enough to not be the bottleneck
    import time
    rng = np.random.RandomState(2)
    scene = rng.randint(0, 255, (4096, 4096, 3), np.uint8)
    from aidet_tpu.data.tiling import tile_coords
    coords = np.asarray(tile_coords(4096, 4096, 1024, 200), np.int32)
    t0 = time.perf_counter()
    out = native.tile_scene_normalized(scene, coords, 1024,
                                       IMAGENET_MEAN, IMAGENET_STD)
    dt = time.perf_counter() - t0
    rate = len(coords) / dt
    assert out.shape[1:] == (1024, 1024, 3)
    # smoke bound only: this sandbox exposes ONE shared core (~12
    # patches/s/core when idle; the OpenMP loop scales with cores on a
    # real host) and CI load makes absolute timing unreliable
    assert rate > 1, f"native tiler too slow: {rate:.1f} patches/s"
