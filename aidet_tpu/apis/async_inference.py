"""Asynchronous inference.

Parity target: the reference's async CUDA-stream machinery
(apis/inference.py:90 async_inference_detector, detectors/base.py:77
aforward_test, utils/contextmanagers.py completed/concurrent).  On
TPU the runtime is natively asynchronous: a jitted call returns device
futures immediately, so a pipeline keeps N batches in flight simply by
not blocking on them.  ``AsyncInferencer`` exposes that as a submit /
drain queue plus an asyncio coroutine for API parity.
"""

from __future__ import annotations

import asyncio
import collections
import functools

import jax
import numpy as np

from ..data.pipeline import TestPipeline


class AsyncInferencer:
    """Keep up to ``depth`` batches in flight on the device."""

    def __init__(self, model, variables, depth: int = 2,
                 img_size: int | None = None):
        self.model = model
        self.variables = variables
        self.depth = depth
        self.pipe = TestPipeline(img_size=img_size
                                 or getattr(model, "img_size", 1024))
        # shared per-model jit cache — a fresh jax.jit per inferencer
        # would retrace + recompile the model on every construction
        from .inference import _jitted_predict
        self._predict = _jitted_predict(model)
        self._queue: collections.deque = collections.deque()

    def submit(self, img: np.ndarray, tag=None):
        """Enqueue one BGR image; returns immediately (async dispatch).
        If the in-flight queue is full, the oldest result is drained
        first and returned, else None."""
        drained = None
        if len(self._queue) >= self.depth:
            drained = self.drain_one()
        s = self.pipe(img)
        out = self._predict(self.variables, s["imgs"][None],
                            s["img_shapes"][None],
                            np.asarray([s["scale_factors"]], np.float32))
        self._queue.append((tag, out))
        return drained

    def drain_one(self):
        if not self._queue:
            return None
        tag, out = self._queue.popleft()
        return tag, jax.device_get(out)

    def drain_all(self):
        res = []
        while self._queue:
            res.append(self.drain_one())
        return res


async def async_inference_detector(model, variables, img):
    """Coroutine parity with apis/inference.py:90: runs the blocking
    device-get in the default executor so the event loop stays free."""
    inf = AsyncInferencer(model, variables, depth=1)
    inf.submit(img)
    loop = asyncio.get_event_loop()
    return await loop.run_in_executor(None, inf.drain_one)
