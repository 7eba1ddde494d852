"""Async inference tests (parity: reference tests/test_async.py)."""

import asyncio

import jax
import numpy as np

from aidet_tpu.apis.async_inference import (AsyncInferencer,
                                            async_inference_detector)
from aidet_tpu.models import build_detector

from test_models_forward import IMG, _small_cfg


def _tiny_model():
    model = build_detector(dict(type="FasterRCNN", **_small_cfg()))
    import jax.numpy as jnp
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)))
    return model, variables


def test_async_inferencer_pipeline():
    model, variables = _tiny_model()
    inf = AsyncInferencer(model, variables, depth=2, img_size=IMG)
    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 255, (IMG, IMG, 3), np.uint8)
            for _ in range(5)]
    drained = []
    for i, img in enumerate(imgs):
        out = inf.submit(img, tag=i)
        if out is not None:
            drained.append(out)
    drained += inf.drain_all()
    tags = [t for t, _ in drained]
    assert sorted(tags) == [0, 1, 2, 3, 4]
    for _, out in drained:
        assert out["boxes"].shape == (1, 20, 4)
        assert np.isfinite(out["scores"]).all()


def test_async_coroutine():
    model, variables = _tiny_model()
    img = np.zeros((IMG, IMG, 3), np.uint8)
    tag_out = asyncio.run(async_inference_detector(model, variables, img))
    assert tag_out is not None
    _, out = tag_out
    assert out["boxes"].shape == (1, 20, 4)
