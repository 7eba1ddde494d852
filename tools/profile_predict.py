"""Stage-level profile of the flagship predict path on the current
accelerator.

Times each stage standalone under jit (XLA overlaps some stages in the
full program, so the sum exceeds the full-predict time) and prints a
table plus the full-predict number. Used to drive the perf work: the
reference point is BASELINE.json's 125 patches/s/chip share.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _bench_util import timeit  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--img-size", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_flagship

    b, s = args.batch, args.img_size
    model = _build_flagship(s)
    imgs = jnp.zeros((b, s, s, 3), jnp.float32)
    shapes = jnp.tile(jnp.asarray([[s, s]], jnp.float32), (b, 1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)

    rows = []

    def bench(name, fn, *a):
        t = timeit(fn, *a, iters=args.iters)
        rows.append((name, t * 1e3))
        print(f"{name:26s} {t * 1e3:9.2f} ms", flush=True)
        return t

    # full predict
    t_full = bench(
        "predict (full)",
        functools.partial(model.apply, method="predict"),
        variables, imgs, shapes)

    # extract_feat
    def feat_fn(v, im):
        return model.apply(v, im, method="extract_feat")
    bench("extract_feat", feat_fn, variables, imgs)

    # backbone only
    def bb_fn(v, im):
        return model.apply(v, im,
                           method=lambda m, x: m._backbone(x))
    bench("backbone", bb_fn, variables, imgs)

    feats = jax.jit(feat_fn)(variables, imgs)

    # neck only
    bb_out = jax.jit(bb_fn)(variables, imgs)
    bench("neck (FPN)", lambda v, x: model.apply(
        v, x, method=lambda m, xx: m._neck(xx)), variables, bb_out)

    # rpn head
    def rpn_fn(v, f):
        return model.apply(v, f, method=lambda m, ff: m._rpn_outputs(ff))
    bench("rpn head", rpn_fn, variables, feats)

    rpn_out = jax.jit(rpn_fn)(variables, feats)

    # rpn proposals
    from aidet_tpu.models.detectors.two_stage import (DEFAULT_TEST_CFG,
                                                      _merge)
    ec = _merge(DEFAULT_TEST_CFG, model.test_cfg)

    import numpy as np
    lvl_sizes = tuple(int(x) for x in np.asarray(
        jax.device_get(rpn_out[4])).reshape(-1))
    stds = tuple(float(x) for x in np.asarray(
        jax.device_get(rpn_out[3])).reshape(-1))

    def prop_fn(v, ro, sh):
        from aidet_tpu.models.heads.anchor_head import rpn_proposals
        cls_flat, reg_flat, anchors = ro[:3]
        return rpn_proposals(cls_flat, reg_flat, anchors, lvl_sizes,
                             sh, target_stds=stds, **ec["rpn"])
    bench("rpn_proposals", prop_fn, variables, rpn_out, shapes)

    props, _, prop_valid = jax.jit(prop_fn)(variables, rpn_out, shapes)

    # roi features
    def roi_fn(v, f, p):
        return model.apply(
            v, f, p,
            method=lambda m, ff, pp: m._roi_features(
                ff, pp, m._bbox_head.roi_feat_size, infer=True))
    bench("roi_features", roi_fn, variables, feats, props)

    crops = jax.jit(roi_fn)(variables, feats, props)

    # bbox + rbbox heads
    def heads_fn(v, c):
        flat = c.reshape((-1,) + c.shape[2:])

        def run(m, cc):
            outs = m._bbox_head(cc)
            if m._rbbox_head is not None:
                outs += m._rbbox_head(cc)
            return outs
        return model.apply(v, flat, method=run)
    bench("bbox(+rbbox) heads", heads_fn, variables, crops)

    print(f"\nbatch={b} img={s} platform={jax.devices()[0].platform}")
    print(f"{'stage':26s} {'ms':>9s}")
    for name, ms in rows:
        print(f"{name:26s} {ms:9.2f}")
    print(f"\nthroughput: {b / t_full:.1f} patches/s/chip")


if __name__ == "__main__":
    main()
