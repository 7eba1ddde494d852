"""Config-sweep construction test — the analog of the reference's
tests/test_config.py:19 (build every config, construct the detector)."""

import glob
import os

from aidet_tpu.models import build_detector
from aidet_tpu.utils.config import Config

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_all_configs_build():
    files = sorted(glob.glob(os.path.join(CFG_DIR, "*.py")))
    assert files, "no configs found"
    for f in files:
        cfg = Config.fromfile(f)
        model = build_detector(cfg.model,
                               train_cfg=cfg.get("train_cfg"),
                               test_cfg=cfg.get("test_cfg"))
        assert model is not None, f
        assert "data" in cfg and "train" in cfg.data, f


def test_config_attribute_access():
    f = os.path.join(CFG_DIR, "dota_theta_obb_r50_fpn_1x.py")
    cfg = Config.fromfile(f)
    assert cfg.model["type"] == "RBBoxRCNN"
    assert cfg.optimizer.lr == 0.02
    assert cfg.total_epochs == 12


def test_all_train_pipelines_construct():
    """Every config's train_pipeline dict must be valid TrainPipeline
    kwargs (catches variant-config knobs that drift from the pipeline
    signature)."""
    from aidet_tpu.data.pipeline import TestPipeline, TrainPipeline
    files = sorted(glob.glob(os.path.join(CFG_DIR, "*.py")))
    for f in files:
        cfg = Config.fromfile(f)
        try:
            TrainPipeline(**cfg.get("train_pipeline", {}))
        except ImportError as e:
            # albu/instaboost configs legitimately require optional
            # packages not vendored in this image; anything else is a
            # real failure
            assert ("albumentations" in str(e)
                    or "instaboostfast" in str(e)), (f, e)
        tp = cfg.get("test_pipeline")
        if tp:
            TestPipeline(**tp)


def test_base_inheritance_merge():
    """_base_ configs: deltas override, untouched keys inherit
    (mmcv Config._merge_a_into_b semantics)."""
    cfg = Config.fromfile(
        os.path.join(CFG_DIR, "dota_centermap_obb_r50_fpn_2x.py"))
    # overridden
    assert cfg.total_epochs == 24
    assert tuple(cfg.lr_config["step"]) == (16, 22)
    # inherited through the recursive dict merge
    assert cfg.lr_config["warmup_iters"] == 500
    assert cfg.optimizer["lr"] == 0.02
    assert cfg.model["type"] == "CenterMapOBB"
    assert cfg.model["mask_head"]["num_convs"] == 10

    caffe = Config.fromfile(
        os.path.join(CFG_DIR, "dota_centermap_obb_r50_caffe_fpn_1x.py"))
    assert caffe.model["backbone"]["style"] == "caffe"
    assert caffe.model["backbone"]["depth"] == 50  # inherited
    assert caffe.train_pipeline["to_rgb"] is False
    assert caffe.train_pipeline["img_size"] == 1024  # inherited

    small = Config.fromfile(os.path.join(
        CFG_DIR, "dota_centermap_obb_r50_fpn_exclude_small_1x.py"))
    assert small.data["train"]["min_area"] == 80
    assert small.data["train"]["ann_file"].endswith(
        "train_patches.json")  # inherited sibling key
