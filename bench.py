"""End-to-end flagship benchmark: inference throughput + train step.

Measures (a) 1024x1024 DOTA-patch inference (RBBoxRCNN R50-FPN, bf16,
full post-processing: RPN + RoI heads + rotated decode + NMS) and
(b) the full training step (loss + grads + SGD update, batch 8, 64 gt)
on the available accelerator, and prints ONE JSON line.  The primary
metric stays inference throughput (BASELINE.json: >=1000 patches/s on
a v5e-8 = 125 patches/s/chip); the train numbers ride along as extra
keys (train_imgs_per_sec_chip / train_step_ms).
"""

from __future__ import annotations

import json
import os
import time

# persistent compile cache: the flagship train step is a ~10-min cold
# remote compile; cache it across bench invocations / rounds
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")


def measure_inference():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_flagship

    img_size = 1024
    # batch 16 default; larger batches amortize fixed per-dispatch and
    # post-processing costs (A/B via env in the perf session)
    batch = int(os.environ.get("AIDET_BENCH_BATCH", "16"))
    model = _build_flagship(img_size)
    # raw uint8 input — the real serving path (device-side
    # normalization, models/preprocess.py) is part of the bill
    imgs = jnp.zeros((batch, img_size, img_size, 3), jnp.uint8)
    shapes = jnp.tile(jnp.asarray([[img_size, img_size]], jnp.float32),
                      (batch, 1))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, img_size, img_size, 3), jnp.float32))

    # thread a device-side accumulator through the calls: the N
    # dispatches chain on-device and only the final float() pays one
    # host round-trip (block_until_ready alone does not reliably
    # synchronize through remote-device tunnels, and a per-iteration
    # sync would bill the tunnel RTT to every batch)
    def _step(v, im, sh, acc):
        # chain through img_shapes (a float input): adding to the
        # uint8 imgs would silently promote them to f32 and skip the
        # on-device normalize path being measured
        out = model.apply(v, im, sh + acc * 0e-9, method="predict")
        acc = acc + out["scores"].sum() + out["boxes"].sum()
        if "rboxes" in out:
            acc = acc + out["rboxes"].sum()
        return acc

    fn = jax.jit(_step)
    acc = jnp.float32(0)
    acc = fn(variables, imgs, shapes, acc)      # compile + warm
    float(acc)

    n_iters = 20
    acc = jnp.float32(0)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        acc = fn(variables, imgs, shapes, acc)  # chained on-device
    float(acc)                                  # one sync at the end
    dt = time.perf_counter() - t0
    return n_iters * batch / dt


def measure_scene_e2e(n_scenes: int = 8, scene: int = 3072,
                      patch: int = 1024, overlap: int = 200):
    """Full serving path per scene: host tiling → uint8 transfer →
    jitted predict (incl. on-device normalize) → host lift + global
    per-class rotated NMS merge (data/tiling.py, the wwtool
    mergebypoly replacement).  Returns patches/sec including all host
    work — the honest line-rate number for the BASELINE north star."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _build_flagship
    from aidet_tpu.data.np_rboxes import thetaobb2pointobb
    from aidet_tpu.data.tiling import device_tiler, merge_patch_detections

    model = _build_flagship(patch)
    # auto = pallas on chip, XLA off-chip (CPU smoke-testability)
    model = model.clone(roi_align_impl="auto")
    rs = np.random.RandomState(0)
    scene_img = rs.randint(0, 256, (scene, scene, 3), np.uint8)
    # device-side tiling: ship the scene once (~28 MB uint8), slice
    # into overlapping patches on device (static lax.slice) — the
    # host-tiled path ships ~50 MB and pays a host copy loop per scene
    tiler, offs = device_tiler(scene, scene, patch, overlap)
    n = len(offs)
    shapes = jnp.tile(jnp.asarray([[patch, patch]], jnp.float32), (n, 1))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, patch, patch, 3),
                                         jnp.float32))
    predict = jax.jit(lambda v, im, sh: model.apply(v, im, sh,
                                                    method="predict"))

    def dispatch():
        """Async scene put + on-device tile + predict dispatch."""
        scene_dev = jax.device_put(scene_img)
        return predict(variables, tiler(scene_dev), shapes), offs

    def drain(out_dev, offs_):
        """Lift one scene's outputs + global rotated-NMS merge (host)."""
        out = jax.device_get(out_dev)
        quads = thetaobb2pointobb(np.asarray(out["rboxes"]))
        dets = [dict(boxes=quads[i], scores=out["scores"][i],
                     labels=out["labels"][i], valid=out["valid"][i])
                for i in range(n)]
        return merge_patch_detections(dets, offs_, num_classes=15,
                                      box_type="quad")

    drain(*dispatch())                         # compile + warm
    # depth-1 software pipeline — the serving pattern
    # (apis/async_inference.py): scene i+1's transfer + device compute
    # run while scene i's outputs are lifted and merged on the host,
    # so the device never idles behind the host-side merge
    t0 = time.perf_counter()
    pending = None
    for _ in range(n_scenes):
        nxt = dispatch()
        if pending is not None:
            drain(*pending)
        pending = nxt
    drain(*pending)
    dt = time.perf_counter() - t0

    # decomposed serial pass (round-4 review item 5): split the honest
    # number into host tile / uint8 transfer / device predict / host
    # lift+merge so the tunnel tax is isolated, not assumed
    stages = dict(tile=0.0, transfer=0.0, predict=0.0, merge=0.0)
    n_probe = 2
    for _ in range(n_probe):
        s0 = time.perf_counter()
        scene_dev = jax.device_put(scene_img)
        jax.block_until_ready(scene_dev)
        s1 = time.perf_counter()
        patches_dev = tiler(scene_dev)
        jax.block_until_ready(patches_dev)
        s2 = time.perf_counter()
        out_dev = predict(variables, patches_dev, shapes)
        jax.block_until_ready(out_dev)
        s3 = time.perf_counter()
        drain(out_dev, offs)
        s4 = time.perf_counter()
        stages["transfer"] += s1 - s0
        stages["tile"] += s2 - s1
        stages["predict"] += s3 - s2
        stages["merge"] += s4 - s3
    stages = {k: v / n_probe * 1e3 for k, v in stages.items()}  # ms/scene
    ex_transfer = n / ((stages["tile"] + stages["predict"]
                        + stages["merge"]) / 1e3)
    return n_scenes * n / dt, stages, ex_transfer


def measure_train(batch: int = 8, img_size: int = 1024, max_gt: int = 64,
                  n_iters: int = 8):
    """Full flagship train-step rate (fwd + bwd + SGD), one chip.

    Steps chain on-device through the donated TrainState; one sync at
    the end (same tunnel-amortizing scheme as inference).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _build_flagship
    from aidet_tpu.parallel import (build_lr_schedule, build_optimizer,
                                    create_train_state, make_train_step)

    model = _build_flagship(img_size)
    # flagship train hyperparams (configs/dota_theta_obb_r50_fpn_1x.py).
    # roi_align_impl auto = pallas on chip, XLA off-chip (lets the
    # same path smoke-test on CPU where Pallas can't compile)
    model = model.clone(roi_align_impl="auto", train_cfg=dict(
        rpn=dict(pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3,
                 num_samples=256, pos_fraction=0.5, allowed_border=0),
        rpn_proposal=dict(nms_pre=2000, nms_post=2000, max_num=2000,
                          nms_thr=0.7),
        rcnn=dict(pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5,
                  num_samples=512, pos_fraction=0.25)))

    rs = np.random.RandomState(0)
    xy = rs.uniform(32, img_size - 200, (batch, max_gt, 2))
    wh = rs.uniform(16, 160, (batch, max_gt, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    theta = rs.uniform(-1.5, -0.01, (batch, max_gt, 1)).astype(np.float32)
    rboxes = np.concatenate([xy + wh / 2, wh, theta],
                            -1).astype(np.float32)
    train_batch = dict(
        imgs=rs.randn(batch, img_size, img_size, 3).astype(np.float32),
        gt_boxes=boxes,
        gt_rboxes=rboxes,
        gt_valid=np.ones((batch, max_gt), bool),
        gt_labels=rs.randint(1, 16, (batch, max_gt)).astype(np.int32),
        img_shapes=np.tile([[img_size, img_size]],
                           (batch, 1)).astype(np.float32))
    train_batch = {k: jnp.asarray(v) for k, v in train_batch.items()}

    optimizer = build_optimizer(build_lr_schedule(base_lr=0.02))
    state = create_train_state(
        model, optimizer,
        np.zeros((1, img_size, img_size, 3), np.float32),
        jax.random.PRNGKey(0))
    step = make_train_step(model, optimizer)
    rng = jax.random.PRNGKey(1)

    state, metrics = step(state, train_batch, rng)   # compile + warm
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, metrics = step(state, train_batch, rng)
    float(metrics["loss"])                           # one sync
    dt = time.perf_counter() - t0
    return n_iters * batch / dt, dt / n_iters * 1e3


def main():
    patches_per_sec = measure_inference()
    out = {
        "metric": "dota_1024_patch_inference_throughput",
        "value": round(patches_per_sec, 2),
        "unit": "patches/sec/chip",
        "vs_baseline": round(patches_per_sec / (1000.0 / 8.0), 3),
    }
    # A/B perf sessions iterate on inference flags; skip the extra
    # compiles there (AIDET_BENCH_SKIP_TRAIN=1).  The extras must
    # never take the primary metric down with them (e.g. a cold
    # train-step compile outliving the driver's patience) — guard.
    if os.environ.get("AIDET_BENCH_SKIP_TRAIN", "0") != "1":
        import signal

        def _budget(seconds):
            def handler(signum, frame):
                raise TimeoutError(f"bench extra exceeded {seconds}s")
            signal.signal(signal.SIGALRM, handler)
            signal.alarm(seconds)

        try:
            _budget(int(os.environ.get("AIDET_BENCH_EXTRA_BUDGET",
                                       "1500")))
            scene_rate, scene_stages, ex_transfer = measure_scene_e2e()
            out["scene_e2e_patches_per_sec"] = round(scene_rate, 2)
            out["scene_e2e_ex_transfer"] = round(ex_transfer, 2)
            out["scene_stage_ms"] = {
                k: round(v, 1) for k, v in scene_stages.items()}
        except Exception as e:   # pragma: no cover
            out["scene_e2e_error"] = repr(e)[:120]
        try:
            _budget(int(os.environ.get("AIDET_BENCH_EXTRA_BUDGET",
                                       "2400")))
            train_ips, train_ms = measure_train()
            out["train_imgs_per_sec_chip"] = round(train_ips, 2)
            out["train_step_ms"] = round(train_ms, 1)
        except Exception as e:   # pragma: no cover
            out["train_error"] = repr(e)[:120]
        signal.alarm(0)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
