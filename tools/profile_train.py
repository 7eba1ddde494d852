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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _build_flagship
    from aidet_tpu.parallel import (build_lr_schedule, build_optimizer,
                                    create_train_state, make_train_step)

    b, s, g = args.batch, args.img_size, args.max_gt
    model = _build_flagship(s)
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

    print(f"\nbatch={b} img={s} platform={jax.devices()[0].platform}")
    print(f"forward loss          {t_fwd * 1e3:9.2f} ms")
    print(f"full train step       {t_step * 1e3:9.2f} ms "
          f"(bwd+update ≈ {(t_step - t_fwd) * 1e3:.2f} ms)")
    print(json.dumps(dict(
        metric="dota_1024_train_step_throughput",
        value=round(b / t_step, 2), unit="imgs/sec/chip",
        step_ms=round(t_step * 1e3, 1))))


if __name__ == "__main__":
    main()
