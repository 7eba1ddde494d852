"""Utils tests: registry/config, fuse_conv_bn numerics, flops, logging."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aidet_tpu.models.backbones.resnet import ResNet
from aidet_tpu.utils.fuse_bn import fuse_conv_bn
from aidet_tpu.utils.logging import collect_env
from aidet_tpu.utils.registry import Registry, build_from_cfg


def test_registry_and_builder():
    reg = Registry("thing")

    @reg.register
    class Foo:
        def __init__(self, a=1):
            self.a = a

    obj = build_from_cfg(dict(type="Foo", a=5), reg)
    assert isinstance(obj, Foo) and obj.a == 5
    with pytest.raises(KeyError):
        build_from_cfg(dict(type="Bar"), reg)
    with pytest.raises(KeyError):
        reg.register(Foo)  # duplicate


def test_fuse_conv_bn_preserves_outputs():
    m = ResNet(depth=18)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3)
                    .astype(np.float32))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    # randomize the BN stats so folding is non-trivial
    import jax.tree_util as jtu

    def randomize(path, leaf):
        name = "/".join(str(p) for p in path)
        rng = np.random.RandomState(abs(hash(name)) % (2 ** 31))
        if "mean" in name:
            return jnp.asarray(rng.uniform(-0.5, 0.5, leaf.shape)
                               .astype(np.float32))
        if "var" in name:
            return jnp.asarray(rng.uniform(0.5, 1.5, leaf.shape)
                               .astype(np.float32))
        return leaf
    v = dict(v)
    v["batch_stats"] = jtu.tree_map_with_path(randomize,
                                              v["batch_stats"])
    out_ref = jax.jit(m.apply)(v, x)
    fused = fuse_conv_bn(v)
    out_fused = jax.jit(m.apply)(fused, x)
    for a, b in zip(out_ref, out_fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=1e-3)


def test_collect_env():
    info = collect_env()
    assert "jax" in info and "python" in info


def test_flops_counter_small_model():
    from aidet_tpu.utils.flops import get_model_complexity_info
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(8, (3, 3), padding=1)(x)

    flops, params, _ = get_model_complexity_info(Tiny(), (1, 16, 16, 3))
    assert params == 3 * 3 * 3 * 8 + 8
    # conv flops ≈ 2*H*W*k*k*cin*cout
    expected = 2 * 16 * 16 * 9 * 3 * 8
    assert flops <= 0 or abs(flops - expected) / expected < 0.5


def test_latest_step_ignores_orbax_tmp_dirs(tmp_path):
    """Interrupted saves leave '<name>.orbax-checkpoint-tmp-<ts>' dirs;
    resume must pick the last COMPLETED step, not crash."""
    from aidet_tpu.utils.checkpoint import latest_step
    for d in ("step_3", "step_5", "step_6.orbax-checkpoint-tmp-1723",
              "model_5", "meta.json_ignoreme"):
        (tmp_path / d).mkdir()
    assert latest_step(str(tmp_path)) == 5
    assert latest_step(str(tmp_path), "model_") == 5


def test_config_nested_delete_stripped(tmp_path):
    """_delete_ markers nested under a replaced (non-merged) key must
    not leak into the built config."""
    base = tmp_path / "base.py"
    base.write_text("model = dict(type='FasterRCNN')\n")
    child = tmp_path / "child.py"
    child.write_text(
        "_base_ = 'base.py'\n"
        "model = dict(bbox_head=dict(type='X', loss_cls=dict("
        "_delete_=True, type='FocalLoss')))\n")
    from aidet_tpu.utils.config import Config
    cfg = Config.fromfile(str(child))
    lc = cfg.model["bbox_head"]["loss_cls"]
    assert "_delete_" not in lc, lc
    assert lc["type"] == "FocalLoss"
