"""Chip microbenches: RoIAlign kernel variants + stem phase A/B, at
flagship shapes (batch 16, 1024^2, bf16).

Run after the e2e suite frees the chip; prints a ms table per variant
so the flagship flags (AIDET_ROI_BAND, stem toggles) can be set to
whatever actually wins on hardware.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _bench_util import timeit  # noqa: E402


def bench_roi(iters):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aidet_tpu.ops.roi_align_band import roi_align_band
    from aidet_tpu.ops.roi_align_bandx import roi_align_bandx
    from aidet_tpu.ops.roi_align_pallas import roi_align_pallas

    b, r, c = 16, 1000, 256
    sizes = [256, 128, 64, 32]
    strides = (4, 8, 16, 32)
    key = jax.random.PRNGKey(0)
    feats = [jax.random.normal(key, (b, s, s, c), jnp.bfloat16)
             for s in sizes]
    rs = np.random.RandomState(0)
    xy = rs.uniform(0, 960, (b, r, 2)).astype(np.float32)
    wh = rs.uniform(8, 320, (b, r, 2)).astype(np.float32)
    rois = jnp.asarray(np.concatenate(
        [xy, np.minimum(xy + wh, 1023)], -1))

    for name, fn in [
            ("window (roi_align_pallas)",
             lambda f, rr: roi_align_pallas(list(f), rr, 7, strides)),
            ("band   (roi_align_band)",
             lambda f, rr: roi_align_band(list(f), rr, 7, strides)),
            ("bandx  (roi_align_bandx)",
             lambda f, rr: roi_align_bandx(list(f), rr, 7, strides))]:
        try:
            t = timeit(fn, feats, rois, iters=iters)
            print(f"roi {name:30s} {t * 1e3:8.2f} ms  "
                  f"({b * r} rois)", flush=True)
        except Exception as e:  # VMEM infeasible etc.
            print(f"roi {name:30s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


def bench_stem(iters):
    """Full-backbone A/B of the phase-decomposed s2d stem conv (same
    checkpoint tree, so one init serves both variants)."""
    import jax
    import jax.numpy as jnp

    from aidet_tpu.models.backbones.resnet import ResNet

    b, s = 16, 1024
    imgs = jnp.zeros((b, s, s, 3), jnp.float32)
    kw = dict(depth=50, dtype=jnp.bfloat16, stem_space_to_depth=True)
    bb = ResNet(**kw)
    v = jax.jit(bb.init)(jax.random.PRNGKey(0), imgs)
    t = timeit(lambda vv, im: bb.apply(vv, im), v, imgs, iters=iters)
    print(f"backbone s2d stem        {t * 1e3:8.2f} ms", flush=True)
    bbp = ResNet(stem_s2d_phase=True, **kw)
    t = timeit(lambda vv, im: bbp.apply(vv, im), v, imgs, iters=iters)
    print(f"backbone s2d-phase stem  {t * 1e3:8.2f} ms", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--only", choices=["roi", "stem"],
                    default=None)
    args = ap.parse_args()
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    if args.only in (None, "roi"):
        bench_roi(args.iters)
    if args.only in (None, "stem"):
        bench_stem(args.iters)


if __name__ == "__main__":
    main()
