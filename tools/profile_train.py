"""Train-step profile of the flagship on the current accelerator
(round-3 VERDICT item 6).

Times the full jitted train step (loss + grads + SGD update) and the
forward-loss alone, with the tunnel-safe accumulator scheme, and
prints a BENCH-style JSON line for the step throughput.
"""

from __future__ import annotations

import argparse
import functools
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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--max-gt", type=int, default=64)
    ap.add_argument("--stages", action="store_true",
                    help="time each train substage standalone "
                         "(fwd+bwd where gradients flow)")
    ap.add_argument("--cpu", action="store_true",
                    help="pin to host CPU (the ambient axon plugin "
                         "extends JAX_PLATFORMS, so the env var alone "
                         "does not stick)")
    args = ap.parse_args()

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
        # Pallas kernels only run on TPU; XLA path for CPU smoke runs
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
        gt_labels=jnp.asarray(
            rs.randint(1, 16, (b, g)).astype(np.int32)),
        gt_rboxes=jnp.asarray(np.concatenate(
            [(xy + wh / 2), wh, theta], -1).astype(np.float32)),
        img_shapes=jnp.asarray(
            np.tile([[s, s]], (b, 1)).astype(np.float32)))

    optimizer = build_optimizer(
        build_lr_schedule(0.02, warmup_iters=500))
    state = create_train_state(model, optimizer,
                               jnp.zeros((1, s, s, 3)),
                               jax.random.PRNGKey(0))
    step = make_train_step(model, optimizer, donate=False)

    if args.stages:
        _profile_stages(model, state, batch, args.iters)
        return

    # full step, chained through state (step consumes + returns state)
    rng = jax.random.PRNGKey(1)
    state2, metrics = step(state, batch, rng)
    jax.tree_util.tree_map(lambda x: None, jax.device_get(metrics))
    t0 = time.perf_counter()
    cur = state2
    for _ in range(args.iters):
        cur, metrics = step(cur, batch, rng)
    float(metrics["loss"])
    t_step = (time.perf_counter() - t0) / args.iters

    # forward loss only
    def fwd(variables, batch):
        return sum(jax.tree_util.tree_leaves(model.apply(
            variables, method="loss",
            rngs={"sampling": jax.random.PRNGKey(2)}, **batch)))
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    f = jax.jit(fwd)
    acc = f(variables, batch)
    float(acc)
    t0 = time.perf_counter()
    a = jnp.float32(0)
    for _ in range(args.iters):
        a = a + f(variables, batch)
    float(a)
    t_fwd = (time.perf_counter() - t0) / args.iters

    # loss + grads WITHOUT the optimizer/clip/state plumbing: splits
    # the full-step overhead into "inside the loss bwd" vs "update"
    # (round-4 review item 4: the 120 ms substage-vs-step gap)
    def loss_and_grad(params, batch):
        v = dict(variables, params=params)
        return jax.value_and_grad(
            lambda p: fwd(dict(v, params=p), batch))(params)
    g = jax.jit(loss_and_grad)
    val, grads = g(state.params, batch)
    jax.tree_util.tree_map(lambda x: None, jax.device_get(val))
    t0 = time.perf_counter()
    a = jnp.float32(0)
    for _ in range(args.iters):
        val, grads = g(state.params, batch)
        a = a + val
    float(a)
    t_grad = (time.perf_counter() - t0) / args.iters

    print(f"\nbatch={b} img={s} platform={jax.devices()[0].platform}")
    print(f"forward loss          {t_fwd * 1e3:9.2f} ms")
    print(f"loss + grads          {t_grad * 1e3:9.2f} ms "
          f"(bwd ≈ {(t_grad - t_fwd) * 1e3:.2f} ms)")
    print(f"full train step       {t_step * 1e3:9.2f} ms "
          f"(optimizer/clip/state ≈ {(t_step - t_grad) * 1e3:.2f} ms)")
    print(json.dumps(dict(
        metric="dota_1024_train_step_throughput",
        value=round(b / t_step, 2), unit="imgs/sec/chip",
        step_ms=round(t_step * 1e3, 1))))


def _profile_stages(model, state, batch, iters):
    """Standalone-jit timings of the flagship train substages.

    Each stage is timed with the device-accumulator chaining scheme
    (one host sync per stage); stages whose outputs receive gradients
    in the real step are timed as value_and_grad so the VJP cost is
    included. Sums will not exactly match the fused full step (XLA
    fuses across these boundaries and the backbone bwd runs once for
    all consumers), but the ranking locates the cost.
    """
    import time

    import jax
    import jax.numpy as jnp

    from aidet_tpu.models.detectors.two_stage import (
        DEFAULT_TRAIN_CFG, RCNN_TARGET_MEANS, RCNN_TARGET_STDS, _merge)
    from aidet_tpu.models.heads.anchor_head import (anchor_head_loss,
                                                    rpn_proposals)
    from aidet_tpu.models.heads.bbox_head import bbox_head_loss
    from aidet_tpu.core.assign import max_iou_assign
    from aidet_tpu.core.sample import sample_fixed
    from aidet_tpu.core.targets import bbox_target, rbbox_target

    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    tc = _merge(DEFAULT_TRAIN_CFG, model.train_cfg)
    rpn_cfg, rc = tc["rpn"], tc["rcnn"]
    imgs = batch["imgs"]
    b = imgs.shape[0]
    key = jax.random.PRNGKey(3)
    k_rpn, k_rcnn = jax.random.split(key)

    def leaves_sum(t):
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(t))

    def timeit(name, fn, *a):
        f = jax.jit(fn)
        out = f(*a)                      # compile + warm
        jax.tree_util.tree_map(lambda x: None, jax.device_get(out))
        acc = jnp.float32(0)
        # chain a scalar through the calls so the N dispatches queue
        # on-device and only the final float() pays a host sync
        def chained(acc, *a):
            o = f(*a)
            return acc + leaves_sum(jax.tree_util.tree_leaves(o)[0])
        ch = jax.jit(chained)
        acc = ch(acc, *a)
        float(acc)
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for _ in range(iters):
            acc = ch(acc, *a)
        float(acc)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:28s} {dt:9.2f} ms")
        return dt

    # ---- stage outputs needed as inputs downstream (computed once) --
    feats = model.apply(variables, imgs,
                        method=lambda m, x: m.extract_feat(x))
    rpn_out = model.apply(variables, feats,
                          method=lambda m, f: m._rpn_outputs(f))
    (cls_flat, reg_flat, anchors, rpn_stds, lvl_sizes, _, _) = rpn_out
    props, _, prop_valid = rpn_proposals(
        cls_flat, reg_flat, anchors, lvl_sizes, batch["img_shapes"],
        target_stds=rpn_stds, **tc["rpn_proposal"])
    cand = jnp.concatenate([batch["gt_boxes"], props], axis=1)
    cand_valid = jnp.concatenate([batch["gt_valid"], prop_valid], 1)

    def assign_sample(cand, cand_valid, gt, gtv, keys):
        def one(c, cv, g, v, k):
            res = max_iou_assign(
                c, g, v, None, pos_iou_thr=rc["pos_iou_thr"],
                neg_iou_thr=rc["neg_iou_thr"],
                min_pos_iou=rc["min_pos_iou"], box_valid=cv)
            return sample_fixed(k, res.gt_inds, rc["num_samples"],
                                rc["pos_fraction"], rc["neg_pos_ub"])
        return jax.vmap(one)(cand, cand_valid, gt, gtv, keys)

    keys = jax.random.split(k_rcnn, b)
    sample = assign_sample(cand, cand_valid, batch["gt_boxes"],
                           batch["gt_valid"], keys)
    rois = jnp.take_along_axis(cand, sample.inds[..., None], axis=1)
    crops = model.apply(
        variables, feats, rois,
        method=lambda m, f, r: m._roi_features(
            f, r, m._bbox_head.roi_feat_size))
    r = rc["num_samples"]

    # ---- timed stages --------------------------------------------
    print(f"\n-- train substages (batch={b}, standalone jit; "
          "fwd+bwd where grads flow) --")

    def fe_loss(params, imgs):
        v = dict(variables, params=params)
        f = model.apply(v, imgs, method=lambda m, x: m.extract_feat(x))
        return leaves_sum(f)
    timeit("extract_feat fwd+bwd",
           lambda p, im: jax.value_and_grad(fe_loss)(p, im),
           state.params, imgs)

    def rpn_loss_fn(params, feats):
        v = dict(variables, params=params)
        out = model.apply(v, feats, method=lambda m, f: m._rpn_outputs(f))
        return leaves_sum((out[0], out[1]))
    timeit("rpn head fwd+bwd",
           lambda p, f: jax.value_and_grad(rpn_loss_fn, argnums=(0, 1))(
               p, f), state.params, feats)

    from aidet_tpu.models.losses import CrossEntropyLoss, SmoothL1Loss
    cls_loss = CrossEntropyLoss(use_sigmoid=True)
    bbox_loss = SmoothL1Loss(beta=1.0 / 9.0)

    def rpn_tgt_loss(cls_flat, reg_flat):
        d = anchor_head_loss(
            cls_flat, reg_flat, anchors, batch["gt_boxes"],
            batch["gt_valid"], batch["img_shapes"], k_rpn,
            gt_labels=None, target_stds=rpn_stds,
            cls_loss=cls_loss, bbox_loss=bbox_loss,
            assigner_cfg=dict(pos_iou_thr=rpn_cfg["pos_iou_thr"],
                              neg_iou_thr=rpn_cfg["neg_iou_thr"],
                              min_pos_iou=rpn_cfg["min_pos_iou"]),
            sampler_cfg=dict(num_samples=rpn_cfg["num_samples"],
                             pos_fraction=rpn_cfg["pos_fraction"],
                             neg_pos_ub=rpn_cfg["neg_pos_ub"]),
            allowed_border=rpn_cfg["allowed_border"],
            pos_weight=rpn_cfg["pos_weight"], use_sigmoid_cls=True)
        return d["loss_cls"] + d["loss_bbox"]
    timeit("rpn targets+loss fwd+bwd",
           lambda c, rg: jax.value_and_grad(rpn_tgt_loss, argnums=(0, 1))(
               c, rg), cls_flat, reg_flat)

    # finer rpn-target breakdown (round-4 review item 4: the 47 ms
    # substage needs its own ranking — assignment IoU vs sampling vs
    # encode+loss)
    from aidet_tpu.core.assign import max_iou_assign as _mia
    from aidet_tpu.core.sample import random_sample_masks as _rsm

    def _assign_only(gt, gtv):
        def one(g, v):
            return _mia(anchors, g, v, None,
                        pos_iou_thr=rpn_cfg["pos_iou_thr"],
                        neg_iou_thr=rpn_cfg["neg_iou_thr"],
                        min_pos_iou=rpn_cfg["min_pos_iou"]).gt_inds
        return jax.vmap(one)(gt, gtv)
    timeit("  rpn assign (IoU+argmax)", _assign_only,
           batch["gt_boxes"], batch["gt_valid"])

    gt_inds_b = jax.jit(_assign_only)(batch["gt_boxes"],
                                      batch["gt_valid"])

    def _sample_only(gi):
        ks = jax.random.split(k_rpn, b)
        return jax.vmap(lambda g, k: _rsm(
            k, g, rpn_cfg["num_samples"], rpn_cfg["pos_fraction"],
            rpn_cfg["neg_pos_ub"]))(gi, ks)
    timeit("  rpn sample (random masks)", _sample_only, gt_inds_b)

    sm_b = jax.jit(_sample_only)(gt_inds_b)

    def _encode_loss(c, rg, gi):
        def one(g, gi_i, sm_pos, sm_neg):
            safe = jnp.clip(gi_i - 1, 0, g.shape[0] - 1)
            from aidet_tpu.core.boxes import bbox2delta
            deltas = bbox2delta(anchors, g[safe], (0.,) * 4, rpn_stds)
            posf = sm_pos.astype(jnp.float32)
            return (deltas * posf[:, None],
                    jnp.broadcast_to(posf[:, None], deltas.shape),
                    jnp.where(sm_pos, 1, 0),
                    posf + sm_neg.astype(jnp.float32))
        bt, bw, lb, lw = jax.vmap(one)(
            batch["gt_boxes"], gi, sm_b.pos, sm_b.neg)
        nt = (sm_b.num_pos + sm_b.num_neg).sum().astype(jnp.float32)
        return (cls_loss(c, lb, weight=lw, avg_factor=nt)
                + bbox_loss(rg, bt, weight=bw, avg_factor=nt))
    timeit("  rpn encode+loss fwd+bwd",
           lambda c, rg: jax.value_and_grad(
               _encode_loss, argnums=(0, 1))(c, rg, gt_inds_b),
           cls_flat, reg_flat)

    timeit("rpn_proposals (no grad)",
           lambda c, rg: rpn_proposals(
               c, rg, anchors, lvl_sizes, batch["img_shapes"],
               target_stds=rpn_stds, **tc["rpn_proposal"]),
           cls_flat, reg_flat)

    timeit("rcnn assign+sample",
           lambda c, cv: assign_sample(c, cv, batch["gt_boxes"],
                                       batch["gt_valid"], keys),
           cand, cand_valid)

    def roi_loss(feats, rois):
        cr = model.apply(
            variables, feats, rois,
            method=lambda m, f, ro: m._roi_features(
                f, ro, m._bbox_head.roi_feat_size))
        return leaves_sum(cr)
    timeit("roi_features fwd+bwd",
           lambda f, ro: jax.value_and_grad(roi_loss)(f, ro),
           feats, rois)

    def tgt_fn(sample, rois):
        t1 = jax.vmap(lambda sm, ro, g, gl: bbox_target(
            sm, ro, g, gl, RCNN_TARGET_MEANS, RCNN_TARGET_STDS,
            rc["pos_weight"]))(sample, rois, batch["gt_boxes"],
                               batch["gt_labels"])
        out = [t1]
        if "gt_rboxes" in batch and model.rbbox_head:
            t2 = jax.vmap(lambda sm, ro, g, gl: rbbox_target(
                sm, ro, g, gl, model.rbbox_encode,
                pos_weight=rc["pos_weight"]))(
                sample, rois, batch["gt_rboxes"], batch["gt_labels"])
            out.append(t2)
        return tuple(out)
    try:
        timeit("bbox/rbbox targets", tgt_fn, sample, rois)
        tgts = jax.jit(tgt_fn)(sample, rois)
    except Exception as e:  # pragma: no cover - model variants
        print(f"bbox/rbbox targets       skipped ({e})")
        tgts = (jax.jit(lambda s, ro: tgt_fn(s, ro)[0])(sample, rois),)

    def heads_loss(params, crops):
        v = dict(variables, params=params)
        flat = crops.reshape((b * r,) + crops.shape[2:])

        def run(m):
            total = 0.0
            cs, bp = m._bbox_head(flat)
            ft = jax.tree_util.tree_map(
                lambda x: x.reshape((b * r,) + x.shape[2:]), tgts[0])
            lc, lb = bbox_head_loss(cs, bp, ft, m._rcnn_cls_loss,
                                    m._rcnn_bbox_loss,
                                    m._bbox_head.num_classes,
                                    m._bbox_head.reg_class_agnostic)
            total += lc + lb
            if len(tgts) > 1 and m._rbbox_head is not None:
                rcs, rbp = m._rbbox_head(flat)
                frt = jax.tree_util.tree_map(
                    lambda x: x.reshape((b * r,) + x.shape[2:]), tgts[1])
                rlc, rlb = bbox_head_loss(
                    rcs, rbp, frt, m._rcnn_cls_loss, m._rcnn_bbox_loss,
                    m._rbbox_head.num_classes,
                    m._rbbox_head.reg_class_agnostic,
                    box_dim=m._rbbox_head.out_dim_reg)
                total += rlc + rlb
            return total
        return model.apply(v, method=run)
    timeit("bbox(+rbbox) heads+loss",
           lambda p, cr: jax.value_and_grad(heads_loss, argnums=(0, 1))(
               p, cr), state.params, crops)


if __name__ == "__main__":
    main()
