"""Host-path NMS twins vs the jax kernels (lock-step parity).

merge_patch_detections routes per-class suppression through
data/np_rboxes.{quad,bbox}_nms_np so the scene merge never dispatches
to a device; these tests pin the numpy implementations elementwise to
ops/nms.{rnms,nms} and core/riou.quad_overlaps on random candidate
sets, including degenerate (zero-area) quads.
"""

import numpy as np
import pytest

from aidet_tpu.data.np_rboxes import (bbox_nms_np, quad_iou_one_many_np,
                                      quad_nms_np, thetaobb2pointobb)


def _random_quads(rng, n, img=1024):
    cx, cy = rng.uniform(50, img - 50, (2, n))
    w, h = rng.uniform(8, 160, (2, n))
    th = rng.uniform(-1.5, -0.01, n)
    tob = np.stack([cx, cy, w, h, th], -1).astype(np.float32)
    return thetaobb2pointobb(tob).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_quad_iou_matches_jax(seed):
    from aidet_tpu.core.riou import quad_overlaps
    rng = np.random.RandomState(seed)
    base = np.asarray([300, 300, 120, 60, -0.7], np.float32)
    # overlapping rotated rects: jitter the thetaobb params (corner
    # jitter would make self-intersecting quads, undefined for both)
    jit = rng.uniform(-1, 1, (64, 5)).astype(np.float32) \
        * np.asarray([80, 80, 60, 30, 0.7], np.float32)
    q1 = thetaobb2pointobb(base).astype(np.float32)
    q2 = thetaobb2pointobb(base + jit).astype(np.float32)
    q2[:8] = _random_quads(rng, 8)   # plus some far-away ones
    got = quad_iou_one_many_np(q1, q2)
    want = np.asarray(quad_overlaps(q1[None], q2))[0]
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_quad_iou_degenerate_zero():
    q = np.asarray([10, 10, 50, 10, 50, 30, 10, 30], np.float32)
    degen = np.zeros((3, 8), np.float32)       # zero-area quads
    degen[1] = q                                # one real overlap
    got = quad_iou_one_many_np(q, degen)
    assert got[0] == 0 and got[2] == 0
    assert abs(got[1] - 1.0) < 1e-5


@pytest.mark.parametrize("seed,thr", [(0, 0.1), (1, 0.3), (2, 0.5)])
def test_quad_nms_matches_rnms(seed, thr):
    from aidet_tpu.ops.nms import rnms
    import jax.numpy as jnp
    rng = np.random.RandomState(seed)
    quads = _random_quads(rng, 128, img=512)   # dense → real suppression
    scores = rng.uniform(0.01, 1, 128).astype(np.float32)
    got = quad_nms_np(quads, scores, thr)
    want = np.asarray(rnms(jnp.asarray(quads), jnp.asarray(scores), thr))
    assert got.sum() > 0 and got.sum() < len(quads)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed,thr", [(0, 0.5), (3, 0.3)])
def test_bbox_nms_matches_nms(seed, thr):
    from aidet_tpu.ops.nms import nms
    import jax.numpy as jnp
    rng = np.random.RandomState(seed)
    xy = rng.uniform(0, 400, (200, 2)).astype(np.float32)
    wh = rng.uniform(10, 120, (200, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], -1)
    scores = rng.uniform(0.01, 1, 200).astype(np.float32)
    got = bbox_nms_np(boxes, scores, thr)
    want = np.asarray(nms(jnp.asarray(boxes), jnp.asarray(scores), thr))
    assert 0 < got.sum() < 200
    np.testing.assert_array_equal(got, want)


def test_merge_patch_detections_host_only(monkeypatch):
    """The merge path must not import/dispatch jax (tunnel isolation;
    same guard pattern as the host-pipeline no-jax test)."""
    import builtins

    from aidet_tpu.data.tiling import merge_patch_detections

    rng = np.random.RandomState(0)
    quads = _random_quads(rng, 40, img=500)
    dets = [dict(boxes=quads[:20], scores=rng.rand(20).astype(np.float32),
                 labels=rng.randint(0, 15, 20), valid=np.ones(20, bool)),
            dict(boxes=quads[20:], scores=rng.rand(20).astype(np.float32),
                 labels=rng.randint(0, 15, 20), valid=np.ones(20, bool))]

    real_import = builtins.__import__

    def guarded(name, *a, **k):
        if name == "jax" or name.startswith("jax."):
            raise AssertionError("scene merge imported jax")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", guarded)
    out = merge_patch_detections(dets, [(0, 0), (824, 0)],
                                 num_classes=15, box_type="quad")
    assert len(out["boxes"]) > 0
    assert out["boxes"].shape[1] == 8
