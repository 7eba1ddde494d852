"""Two-stage aug-test (merge_augs parity) smoke test: flip-aug
predictions must agree with the identity-aug predictions of the same
model on a mirrored input."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aidet_tpu.models import build_detector

from test_models_forward import IMG, demo_inputs, _small_cfg


def test_aug_predict_flip_consistency():
    model = build_detector(dict(type="FasterRCNN", **_small_cfg()))
    data = demo_inputs(batch=1)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data["imgs"])

    img = data["imgs"][0]
    aug_imgs = jnp.stack([img, img[:, ::-1]])           # identity + flip
    shapes = jnp.asarray([[IMG, IMG], [IMG, IMG]], jnp.float32)
    flips = jnp.asarray([False, True])
    sfs = jnp.asarray([1.0, 1.0], jnp.float32)

    out = jax.jit(functools.partial(model.apply, method="aug_predict"))(
        variables, aug_imgs, shapes, flips, sfs)
    assert out["boxes"].shape[0] == 1
    v = np.asarray(out["valid"][0])
    boxes = np.asarray(out["boxes"][0])[v]
    assert np.isfinite(boxes).all()
    # boxes in the original frame, within bounds
    if len(boxes):
        assert boxes.min() >= -1 and boxes.max() <= IMG
