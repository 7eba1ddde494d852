"""Bisect the flagship train step by partial-loss gradients.

The round-4 substage profile left a ~120 ms gap between the sum of
standalone-jit substages and the fused full step (ROUND4_NOTES).
Standalone stages miss cross-stage fusion and the shared backbone
backward, so this tool measures IN-CONTEXT costs instead: it takes
``value_and_grad`` of the REAL ``model.loss`` but sums only a subset of
the returned loss dict — XLA dead-code-eliminates everything the subset
doesn't touch, so the delta between two subsets is the true fused cost
of the difference.

Subsets (cumulative deltas localize the gap):
  fwd        forward loss only, no grad
  rpn        d(loss_rpn_*)/dparams    — backbone+FPN+RPN head bwd
  rcnn_hbb   + d(loss_cls/loss_bbox)  — + RoI branch bwd (hbb head)
  all        every loss key           — + rbbox head bwd
  step       full train step          — + optimizer/clip/state
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--img-size", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--max-gt", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--variants", default="fwd,rpn,rcnn_hbb,all,step",
                    help="comma list: fwd_rpn (fwd of rpn losses only "
                         "— DCEs the whole rcnn forward chain), fwd, "
                         "rpn, rcnn_hbb, all, step")
    args = ap.parse_args()
    variants = set(args.variants.split(","))
    if args.cpu:
        from aidet_tpu.utils.platform import force_cpu
        force_cpu()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _build_flagship
    from aidet_tpu.parallel import (build_lr_schedule, build_optimizer,
                                    create_train_state, make_train_step)

    b, s, g = args.batch, args.img_size, args.max_gt
    model = _build_flagship(s)
    if args.cpu:
        model = model.clone(roi_align_impl="auto")
    rs = np.random.RandomState(0)
    xy = rs.uniform(10, s - 120, (b, g, 2))
    wh = rs.uniform(12, 100, (b, g, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    theta = rs.uniform(-1.5, -0.01, (b, g, 1)).astype(np.float32)
    batch = dict(
        imgs=jnp.asarray(rs.randn(b, s, s, 3).astype(np.float32)),
        gt_boxes=jnp.asarray(boxes),
        gt_valid=jnp.asarray(np.ones((b, g), bool)),
        gt_labels=jnp.asarray(rs.randint(1, 16, (b, g)).astype(np.int32)),
        gt_rboxes=jnp.asarray(np.concatenate(
            [(xy + wh / 2), wh, theta], -1).astype(np.float32)),
        img_shapes=jnp.asarray(np.tile([[s, s]], (b, 1)).astype(np.float32)))

    optimizer = build_optimizer(build_lr_schedule(0.02, warmup_iters=500))
    state = create_train_state(model, optimizer, jnp.zeros((1, s, s, 3)),
                               jax.random.PRNGKey(0))
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    rng = jax.random.PRNGKey(1)

    def losses_of(params):
        v = dict(variables, params=params)
        return model.apply(v, method="loss", rngs={"sampling": rng},
                           **batch)

    def timed(name, f, *a):
        out = f(*a)
        jax.tree_util.tree_map(lambda x: None, jax.device_get(out))
        acc = jnp.float32(0)

        def chained(acc, *a):
            o = f(*a)
            first = jax.tree_util.tree_leaves(o)[0]
            return acc + jnp.sum(first.astype(jnp.float32))
        ch = jax.jit(chained)
        float(ch(acc, *a))
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for _ in range(args.iters):
            acc = ch(acc, *a)
        float(acc)
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name:14s} {dt:9.2f} ms", flush=True)
        return dt

    res = {}

    def subset_grad(keys_filter):
        def fn(params):
            d = losses_of(params)
            sel = [v for k, v in d.items() if keys_filter(k)]
            return sum(jnp.sum(x) for x in sel)
        return jax.jit(jax.value_and_grad(fn))

    def subset_fwd(keys_filter):
        def fn(params):
            d = losses_of(params)
            return sum(jnp.sum(v) for k, v in d.items()
                       if keys_filter(k))
        return jax.jit(fn)

    if "fwd_rpn" in variants:
        # forward of the rpn losses alone: XLA DCEs proposals, rcnn
        # assignment/sampling, RoI extraction and both rcnn heads even
        # in the FORWARD pass — the delta vs `fwd` is the in-context
        # cost of the whole no-grad rcnn forward chain
        res["fwd_rpn"] = timed("fwd rpn-only", subset_fwd(
            lambda k: k.startswith("loss_rpn")), state.params)
    if "fwd_prop" in variants:
        # needs AIDET_DEBUG_PROP_LOSS=1 so the loss dict carries a key
        # that depends on the proposals but nothing downstream; the
        # delta vs fwd_rpn is the IN-CONTEXT cost of rpn_proposals
        # (decode + per-level NMS), vs fwd the cost of everything after
        res["fwd_prop"] = timed("fwd rpn+proposals", subset_fwd(
            lambda k: k.startswith("loss_rpn") or k == "dbg_prop"),
            state.params)
    if "fwd" in variants:
        res["fwd"] = timed("fwd", subset_fwd(
            lambda k: k != "dbg_prop"), state.params)
    if "rpn" in variants:
        res["rpn"] = timed("grad rpn", subset_grad(
            lambda k: k.startswith("loss_rpn")), state.params)
    if "rcnn_hbb" in variants:
        res["rcnn_hbb"] = timed("grad +rcnn_hbb", subset_grad(
            lambda k: k.startswith("loss_rpn") or k in ("loss_cls",
                                                        "loss_bbox")),
            state.params)
    if "all" in variants:
        res["all"] = timed("grad all", subset_grad(
            lambda k: k != "dbg_prop"), state.params)

    if "step" in variants:
        step = make_train_step(model, optimizer, donate=False)
        res["step"] = timed("full step",
                            lambda st: step(st, batch, rng)[1], state)

    print(json.dumps({"bisect_ms": {k: round(v, 1)
                                    for k, v in res.items()},
                      "batch": b, "img": s}))


if __name__ == "__main__":
    main()
