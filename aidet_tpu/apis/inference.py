"""Single-image inference API.

Parity: mmdet/apis/inference.py:16-117 (init_detector /
inference_detector): build from config, load checkpoint, run one image
through the test pipeline and the jitted predict path.
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from ..data.pipeline import TestPipeline
from ..models import build_detector
from ..utils.config import Config


def init_detector(config, checkpoint: str | None = None):
    """Returns (model, variables, cfg)."""
    if isinstance(config, str):
        config = Config.fromfile(config)
    from ..utils.precision import apply_fp16_cfg
    model_cfg = apply_fp16_cfg(config, dict(config.model))
    model = build_detector(model_cfg,
                           train_cfg=config.get("train_cfg"),
                           test_cfg=config.get("test_cfg"))
    img_size = getattr(model, "img_size", 1024)
    import jax.numpy as jnp
    dummy = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), dummy)
    if checkpoint:
        from ..utils.checkpoint import load_checkpoint
        target = {"params": jax.device_get(variables["params"]),
                  "batch_stats": jax.device_get(
                      variables.get("batch_stats", {}))}
        restored, _meta = load_checkpoint(checkpoint, target,
                                          prefix="model_")
        variables = {"params": restored["params"]}
        if restored.get("batch_stats"):
            variables["batch_stats"] = restored["batch_stats"]
    return model, variables, config


_PREDICT_CACHE: "dict[int, tuple]" = {}
_PREDICT_CACHE_MAX = 8


def _jitted_predict(model):
    # keyed by object identity: flax modules with dict-typed config
    # fields are unhashable, so lru_cache can't be used here. Entries
    # carry a weakref to detect id() reuse, and the cache is bounded
    # (oldest evicted) so config sweeps don't pin every model + its
    # jit traces for process lifetime.
    import weakref
    hit = _PREDICT_CACHE.get(id(model))
    if hit is not None and hit[0]() is model:
        return hit[1]
    fn = jax.jit(functools.partial(model.apply, method="predict"))
    while len(_PREDICT_CACHE) >= _PREDICT_CACHE_MAX:
        _PREDICT_CACHE.pop(next(iter(_PREDICT_CACHE)))
    try:
        ref = weakref.ref(model)
    except TypeError:  # pragma: no cover - flax modules support weakref
        ref = (lambda m=model: m)
    _PREDICT_CACHE[id(model)] = (ref, fn)
    return fn


def inference_detector(model, variables, img, num_classes=None):
    """Run one BGR uint8 image; returns the reference's result format —
    a list over classes of [k, 5] (x1, y1, x2, y2, score) arrays, plus
    the raw padded dict (parity: bbox2result, core/bbox/transforms.py:181).
    """
    pipe = TestPipeline(img_size=getattr(model, "img_size", 1024))
    sample = pipe(img)
    imgs = sample["imgs"][None]
    shapes = sample["img_shapes"][None]
    sf = np.asarray([sample["scale_factors"]], np.float32)
    out = _jitted_predict(model)(variables, imgs, shapes, sf)
    out = jax.device_get(out)
    valid = out["valid"][0]
    boxes = out["boxes"][0][valid]
    scores = out["scores"][0][valid]
    labels = out["labels"][0][valid]
    if num_classes is None:
        num_classes = int(labels.max()) + 1 if len(labels) else 1
    results = []
    for c in range(num_classes):
        m = labels == c
        results.append(
            np.concatenate([boxes[m], scores[m, None]], -1)
            if m.any() else np.zeros((0, 5), np.float32))
    return results, out
