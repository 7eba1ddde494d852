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
                  img_size: int | None = None, progress=None):
    """Run the jitted predict path over a dataset.

    Returns (results, names): results is a list of per-image dicts
    (boxes/scores/labels/valid [+rboxes/masks]), names the file names.
    """
    pipe = TestPipeline(img_size=img_size
                        or getattr(model, "img_size", 1024))
    predict = jax.jit(functools.partial(model.apply, method="predict"))

    import cv2
    results, names = [], []
    n = len(dataset)
    for start in range(0, n, batch_size):
        idxs = list(range(start, min(start + batch_size, n)))
        samples = []
        for i in idxs:
            img = cv2.imread(dataset.img_path(i))
            if img is None:
                info = dataset.img_infos[i]
                img = np.zeros((info.get("height", 512),
                                info.get("width", 512), 3), np.uint8)
            samples.append(pipe(img))
        while len(samples) < batch_size:      # static batch padding
            samples.append(samples[-1])
        batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
        out = predict(variables, batch["imgs"], batch["img_shapes"],
                      batch["scale_factors"])
        out = jax.device_get(out)
        for j, i in enumerate(idxs):
            results.append({k: v[j] for k, v in out.items()})
            names.append(dataset.img_infos[i]["file_name"])
        if progress:
            progress(len(results), n)
    return results, names
