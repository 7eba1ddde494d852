"""Batch inference over a dataset.

Parity: mmdet/apis/test.py:12-72 (single_gpu_test / multi_gpu_test):
the per-rank result shards + pickle-gather machinery collapses into
device-sharded batched predict + host gather.
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from ..data.pipeline import TestPipeline


def run_inference(model, variables, dataset, batch_size: int = 8,
                  img_size: int | None = None, progress=None,
                  mesh=None, num_shards: int = 1, shard_id: int = 0,
                  pipeline_cfg: dict | None = None,
                  precompile_only: bool = False):
    """Run the jitted predict path over a dataset.

    Multi-chip/multi-host (parity: multi_gpu_test + collect_results,
    mmdet/apis/test.py:31-146): pass a data ``mesh`` to shard each
    batch's leading dim over the chips (params replicated), and
    ``num_shards``/``shard_id`` (one shard per host process) to split
    the dataset — results are all-gathered and re-ordered at the end.

    Returns (results, names): results is a list of per-image dicts
    (boxes/scores/labels/valid [+rboxes/masks]), names the file names.
    """
    # pipeline_cfg: the config's ``test_pipeline`` dict (mean/std/
    # to_rgb for the caffe/rgb normalisation variants)
    pcfg = dict(pipeline_cfg or {})
    pcfg.setdefault("img_size", img_size
                    or getattr(model, "img_size", 1024))
    # default to raw-uint8 transfer + on-device normalization (4x less
    # host->device traffic) — but only when the pipeline uses the
    # stock ImageNet constants; custom mean/std stay on the host
    # unless the model carries matching img_norm (caffe variants)
    pcfg.setdefault(
        "device_normalize",
        not any(k in pcfg for k in ("mean", "std", "to_rgb"))
        or getattr(model, "img_norm", None) is not None)
    pipe = TestPipeline(**pcfg)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        n_dev = mesh.devices.size
        if batch_size % n_dev != 0:
            raise ValueError(
                f"batch_size={batch_size} must be divisible by the "
                f"data-mesh device count ({n_dev}); pass e.g. "
                f"--batch-size {-(-batch_size // n_dev) * n_dev}")
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P(mesh.axis_names[0]))
        predict = jax.jit(
            functools.partial(model.apply, method="predict"),
            in_shardings=(repl, data, data, data),
            out_shardings=repl)
    else:
        predict = jax.jit(functools.partial(model.apply,
                                            method="predict"))

    if precompile_only:
        # lower+compile the exact predict program into the persistent
        # cache (no accelerator batches) so a queued test run starts
        # warm; see tools/train.py --precompile for the train analog
        s = pipe.img_size
        img_dt = np.uint8 if pipe.device_normalize else np.float32
        lowered = predict.lower(
            variables,
            jax.ShapeDtypeStruct((batch_size, s, s, 3), img_dt),
            jax.ShapeDtypeStruct((batch_size, 2), np.float32),
            jax.ShapeDtypeStruct((batch_size,), np.float32))
        lowered.compile()
        return [], []

    import cv2
    from concurrent.futures import ThreadPoolExecutor

    def load_one(i):
        img = cv2.imread(dataset.img_path(i))
        if img is None:
            info = dataset.img_infos[i]
            img = np.zeros((info.get("height", 512),
                            info.get("width", 512), 3), np.uint8)
        return pipe(img)

    results, names = [], []
    n = len(dataset)
    my_idxs = list(range(shard_id, n, num_shards))
    batches = [my_idxs[s:s + batch_size]
               for s in range(0, len(my_idxs), batch_size)]
    # threaded decode (cv2 releases the GIL) + one-batch prefetch: the
    # next batch decodes while the device runs the current one —
    # otherwise eval is host-decode-bound with the accelerator idle
    with ThreadPoolExecutor(4) as pool:
        next_futs = ([pool.submit(load_one, i) for i in batches[0]]
                     if batches else [])
        for bi, idxs in enumerate(batches):
            samples = [f.result() for f in next_futs]
            if bi + 1 < len(batches):
                next_futs = [pool.submit(load_one, i)
                             for i in batches[bi + 1]]
            while len(samples) < batch_size:  # static batch padding
                samples.append(samples[-1])
            batch = {k: np.stack([s[k] for s in samples])
                     for k in samples[0]}
            for attempt in range(3):
                try:
                    out = predict(variables, batch["imgs"],
                                  batch["img_shapes"],
                                  batch["scale_factors"])
                    out = jax.device_get(out)
                    break
                except jax.errors.JaxRuntimeError as e:
                    # transient remote-compile / tunnel drops; predict
                    # does not donate, so a plain retry is safe
                    msg = str(e)
                    if attempt == 2 or not any(s in msg for s in (
                            "remote_compile", "read body", "UNAVAILABLE",
                            "DEADLINE_EXCEEDED", "connection reset")):
                        raise
                    import time as _time
                    _time.sleep(20 * (attempt + 1))
            for j, i in enumerate(idxs):
                results.append({k: v[j] for k, v in out.items()})
                names.append(dataset.img_infos[i]["file_name"])
            if progress:
                progress(len(results), len(my_idxs))
    if num_shards > 1:
        from ..parallel.dist import gather_results
        example = None
        if not results:
            # Empty local shard (num_shards > dataset length): derive
            # the result spec without running the model so this
            # process can still contribute to the dense all-gather.
            zeros = {k: np.zeros((batch_size,) + v, np.float32)
                     for k, v in (("imgs", (pipe.img_size,
                                            pipe.img_size, 3)),
                                  ("img_shapes", (2,)),
                                  ("scale_factors", ()))}
            spec = jax.eval_shape(predict, variables, zeros["imgs"],
                                  zeros["img_shapes"],
                                  zeros["scale_factors"])
            example = {k: np.zeros(v.shape[1:], v.dtype)
                       for k, v in spec.items()}
        results = gather_results(results, num_shards, shard_id, n,
                                 example=example)
        names = [dataset.img_infos[i]["file_name"] for i in range(n)]
    return results, names
