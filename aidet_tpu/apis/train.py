"""High-level training API.

Parity: mmdet/apis/train.py:84-165 (train_detector): dataloaders →
distributed wrap → optimizer → epoch loop with hooks — restated as a
jitted pjit train step over a data mesh, with logging, checkpointing
and (optional) eval-hook callbacks.
"""

from __future__ import annotations

import time

import jax
import numpy as np

from ..data.loader import GroupedLoader
from ..parallel import (build_lr_schedule, build_optimizer, create_mesh,
                        create_train_state, make_train_step, replicate,
                        shard_batch)
from ..utils.checkpoint import save_checkpoint
from ..utils.logging import get_root_logger


_LIBC = None


def _malloc_trim():
    """Return freed glibc arenas to the OS.

    Long train runs through the remote-device tunnel grow host RSS
    without bound (observed: 130 GB anon-rss → OOM-kill 60 iters from
    the end of a 12-epoch run).  The per-iteration host allocations
    (batch staging across the loader/prefetch/jax threads) fragment
    glibc's per-thread arenas, which never shrink on free; trimming at
    every log interval (~every 50 steps) is a few ms and bounds RSS.
    """
    global _LIBC
    if _LIBC is False:  # non-glibc platform, probed once
        return
    try:
        if _LIBC is None:
            import ctypes
            _LIBC = ctypes.CDLL("libc.so.6")
        _LIBC.malloc_trim(0)
    except Exception:
        _LIBC = False


def set_random_seed(seed: int):
    """JAX randomness is explicit via keys; this seeds numpy for the
    host-side pipeline (parity: apis/train.py:16-32)."""
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def train_detector(model, dataset, cfg, work_dir: str = "work_dirs/run",
                   eval_hook=None, logger=None,
                   resume_from: str | None = None,
                   load_from: str | None = None,
                   precompile_only: bool = False):
    """Train a detector.

    Args:
      model: a detector module with ``loss`` method.
      dataset: dataset instance (see data/).
      cfg: dict-like with keys: total_epochs, batch_size (global),
        optimizer (lr/momentum/weight_decay/grad_clip), lr_config
        (warmup_iters/warmup_ratio/step), pipeline (TrainPipeline),
        seed, log_interval, checkpoint_interval, n_devices (optional).
      eval_hook: optional callable(state, epoch) run after each epoch
        (parity: core/evaluation/eval_hooks.py).
    Returns the final TrainState.
    """
    # multi-host: one process per host feeds its shard of the global
    # batch (parity: init_dist + DistributedGroupSampler,
    # tools/train.py:47-51 / samplers/group_sampler.py:50-137).
    # MUST run before anything touches the jax backend — the logger's
    # rank gating and PRNGKey creation below both do.
    from ..parallel.dist import init_distributed, local_batch_to_global
    proc_id, proc_count = init_distributed()

    logger = logger or get_root_logger(f"{work_dir}/train.log")
    seed = cfg.get("seed", 0)
    rng = set_random_seed(seed)

    n_avail = len(jax.devices())
    batch_size = cfg.get("batch_size", n_avail * 2)
    n_dev = cfg.get("n_devices")
    if n_dev is None:
        if proc_count > 1:
            # multi-host meshes must cover every host's chips evenly:
            # a divisor-of-batch prefix of jax.devices() would leave
            # hosts with unequal addressable shards and break
            # local_batch_to_global's per-process row accounting
            n_dev = n_avail
        else:  # largest divisor of the batch that fits
            n_dev = max(d for d in range(1, min(n_avail, batch_size) + 1)
                        if batch_size % d == 0)
    mesh = create_mesh(n_dev)
    assert batch_size % n_dev == 0, (
        f"global batch {batch_size} must divide the {n_dev}-device mesh"
        + (" (multi-host runs use ALL devices)" if proc_count > 1
           else ""))
    assert batch_size % proc_count == 0, \
        "global batch must divide the process count"
    if proc_count > 1:
        # establish the cross-process collective context NOW, while
        # the processes are still time-aligned: context creation has a
        # short (~30s) rendezvous timeout, and the first natural
        # collective otherwise lands after divergent per-process jit
        # compiles (observed: Gloo GetKeyValue DEADLINE_EXCEEDED)
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("aidet_tpu/train_init")

    loader = GroupedLoader(dataset, cfg["pipeline"],
                           batch_size // proc_count,
                           seed=seed,
                           num_shards=proc_count, shard_id=proc_id,
                           num_workers=cfg.get("num_workers", 4))
    iters_per_epoch = max(len(loader), 1)
    opt_cfg = cfg.get("optimizer", {})
    lr_cfg = cfg.get("lr_config", {})
    total_epochs = cfg.get("total_epochs", 12)
    # warmup_iters=500 assumes epoch-scale datasets (reference
    # lr_config); on tiny runs (total iters ~ warmup) the ramp would
    # swallow the whole schedule and multiply into the step decay --
    # cap it at 20% of the run.
    warmup_iters = min(int(lr_cfg.get("warmup_iters", 500)),
                       max(1, iters_per_epoch * total_epochs // 5))
    schedule = build_lr_schedule(
        base_lr=opt_cfg.get("lr", 0.02),
        warmup_iters=warmup_iters,
        warmup_ratio=lr_cfg.get("warmup_ratio", 1.0 / 3),
        decay_steps=lr_cfg.get("step", (8, 11)),
        iters_per_epoch=iters_per_epoch)
    optimizer = build_optimizer(
        schedule, momentum=opt_cfg.get("momentum", 0.9),
        weight_decay=opt_cfg.get("weight_decay", 1e-4),
        grad_clip_norm=opt_cfg.get("grad_clip_norm", 35.0))

    img_size = cfg["pipeline"].img_size
    sample = np.zeros((1, img_size, img_size, 3), np.float32)
    if precompile_only:
        # Populate the persistent compile cache for the EXACT train
        # step this function would run (same schedule constants, mesh,
        # shardings, donation, batch spec), without touching the
        # accelerator: eval_shape for the state, abstract lowering for
        # the step.  Lets a later real run start warm while the chip
        # is busy with something else (remote axon compiles are
        # server-side; local cost is negligible).
        state_shapes = jax.eval_shape(
            lambda s, r: create_train_state(model, optimizer, s, r),
            sample, rng)
        step_fn = make_train_step(model, optimizer, mesh=mesh)
        batch = next(iter(loader))
        batch_shapes = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
            batch)
        rng_shape = jax.ShapeDtypeStruct(np.shape(rng),
                                         np.asarray(rng).dtype)
        t0 = time.time()
        step_fn.lower(state_shapes, batch_shapes, rng_shape).compile()
        logger.info("precompiled train step in %.1fs", time.time() - t0)
        return None
    state = create_train_state(model, optimizer, sample, rng)
    start_epoch = 0
    if resume_from:
        # full state incl. optimizer + step (runner.resume parity,
        # apis/train.py:161-164 in the reference)
        from ..utils.checkpoint import load_checkpoint
        state, meta = load_checkpoint(resume_from,
                                      jax.device_get(state))
        start_epoch = int((meta or {}).get("epoch", 0))
        logger.info("resumed from %s at epoch %d", resume_from,
                    start_epoch)
    elif load_from:
        # weights only (runner.load_checkpoint parity)
        from ..utils.checkpoint import load_checkpoint
        target = {"params": jax.device_get(state.params),
                  "batch_stats": jax.device_get(state.batch_stats)}
        restored, _ = load_checkpoint(load_from, target, prefix="model_")
        state = state.replace(params=restored["params"],
                              batch_stats=restored["batch_stats"])
        logger.info("loaded weights from %s", load_from)
    state = replicate(state, mesh)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    logger.info("model params: %.2fM over %d devices",
                n_params / 1e6, n_dev)

    step_fn = make_train_step(model, optimizer, mesh=mesh)
    total_epochs = cfg.get("total_epochs", 12)
    log_interval = cfg.get("log_interval", 50)
    ckpt_interval = cfg.get("checkpoint_interval", 1)

    step_rng = jax.random.fold_in(rng, 1)
    global_step = start_epoch * iters_per_epoch

    def to_device_prefetched(it, depth: int = 2):
        # double-buffered host→device transfer: device_put through a
        # remote tunnel blocks (~226 ms/batch f32, ~57 ms uint8), so
        # overlap batch N+1's transfer with step N's execution —
        # pipeline rate becomes max(step, transfer) instead of the sum
        import queue
        import threading
        q: queue.Queue = queue.Queue(maxsize=depth)
        err: list = []

        def worker():
            try:
                for item in it:
                    q.put(local_batch_to_global(item, mesh))
            except BaseException as e:  # surfaced on the main thread
                err.append(e)
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                if err:
                    raise err[0]
                return
            yield item

    def step_with_retry(state, batch, step_rng, retries: int = 3):
        # The remote-compile tunnel occasionally drops a response
        # mid-flight; a failure during *compilation* leaves the donated
        # state buffers unconsumed, so the call is safe to repeat. A
        # failure after execution consumed them surfaces as a deleted-
        # buffer error on the retry and is re-raised unchanged.
        for attempt in range(retries):
            try:
                return step_fn(state, batch, step_rng)
            except jax.errors.JaxRuntimeError as e:
                msg = str(e)
                transient = any(s in msg for s in (
                    "remote_compile", "read body", "UNAVAILABLE",
                    "DEADLINE_EXCEEDED", "connection reset"))
                if not transient or attempt == retries - 1:
                    raise
                logger.warning("transient runtime error, retry %d/%d:"
                               " %s", attempt + 1, retries - 1,
                               msg.splitlines()[0][:200])
                time.sleep(20 * (attempt + 1))

    for epoch in range(start_epoch, total_epochs):
        loader.set_epoch(epoch)
        t0 = time.time()
        for i, batch in enumerate(to_device_prefetched(iter(loader))):
            state, metrics = step_with_retry(state, batch, step_rng)
            global_step += 1
            if global_step % log_interval == 0:
                m = {k: float(v) for k, v in
                     jax.device_get(metrics).items()}
                dt = (time.time() - t0) / (i + 1)
                logger.info("epoch %d iter %d/%d %.3fs/it lr %.5f %s",
                            epoch + 1, i + 1, iters_per_epoch, dt,
                            float(schedule(global_step)),
                            {k: round(v, 4) for k, v in m.items()})
                _malloc_trim()
        if (epoch + 1) % ckpt_interval == 0 and proc_id == 0:
            save_checkpoint(f"{work_dir}/ckpt", state, epoch + 1,
                            meta=dict(
                                classes=list(getattr(dataset, "CLASSES",
                                                     [])),
                                epoch=epoch + 1))
        if eval_hook is not None:
            eval_hook(state, epoch + 1)
    return state
