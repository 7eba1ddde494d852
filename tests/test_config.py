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
