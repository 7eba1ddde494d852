"""BuildChange eval-workflow tools (parity: reference
tools/buildchange/{buildchange_eval,buildchange_test}.py per-city swap
and tools/upgrade_model_version.py key migration)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(REPO, "tools"))


def _tiny_coco(tmp_path, city="beijing"):
    ann = dict(
        categories=[dict(id=1, name="building")],
        images=[dict(id=1, file_name="a.png", width=64, height=64)],
        annotations=[dict(id=1, image_id=1, category_id=1,
                          bbox=[10, 10, 20, 20], area=400, iscrowd=0)])
    path = tmp_path / f"val_{city}.json"
    path.write_text(json.dumps(ann))
    return str(path)


def test_retarget_city_swaps_test_paths(tmp_path):
    from buildchange_eval import retarget_city

    from aidet_tpu.utils.config import Config
    cfg = Config.fromfile(
        os.path.join(REPO, "configs",
                     "buildchange_mask_rcnn_r50_beijing.py"))
    assert cfg.city == "beijing"
    cfg = retarget_city(cfg, "jinan")
    assert "jinan" in cfg.data["test"]["ann_file"]
    assert "jinan" in cfg.data["test"]["img_prefix"]
    assert "beijing" not in cfg.data["test"]["ann_file"]


def test_buildchange_eval_cli_runs(tmp_path):
    ann = _tiny_coco(tmp_path)
    cfg_path = tmp_path / "cfg.py"
    cfg_path.write_text(
        f'_base_ = "{REPO}/configs/buildchange_mask_rcnn_r50.py"\n'
        f'data = dict(test=dict(ann_file="{ann}", img_prefix="",'
        f' test_mode=True))\n')
    # one perfect detection -> AP50 == 1
    import pickle
    results = [dict(boxes=np.array([[10., 10., 29., 29.]], np.float32),
                    scores=np.array([0.9], np.float32),
                    labels=np.array([0], np.int32),
                    valid=np.array([True]))]
    pkl = tmp_path / "res.pkl"
    pkl.write_bytes(pickle.dumps(dict(results=results)))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "buildchange_eval.py"),
         str(cfg_path), str(pkl), "--eval", "bbox",
         "--jsonfile-prefix", str(tmp_path / "det")],
        capture_output=True, text=True, env=dict(
            os.environ, JAX_PLATFORMS="cpu"))
    assert out.returncode == 0, out.stderr
    assert "AP50:      1.0000" in out.stdout.replace("  ", " ") \
        or "AP50" in out.stdout
    exported = json.loads((tmp_path / "det.bbox.json").read_text())
    assert exported[0]["category_id"] == 1
    assert exported[0]["bbox"][2] == pytest.approx(20.0)


def test_upgrade_model_version_renames(tmp_path):
    from upgrade_model_version import _flatten, _unflatten, upgrade

    tree = {"params": {"backbone": {"lateral_convs_0": {"w": np.ones(2)}},
                       "head": {"b": np.zeros(3)}},
            "batch_stats": {}}
    items = list(_flatten(tree))
    assert _unflatten(items)["params"]["head"]["b"].shape == (3,)

    import orbax.checkpoint as ocp
    in_dir = tmp_path / "in"
    os.makedirs(in_dir)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(str(in_dir / "model_7"),
                   {"params": {"old_name": {"w": np.ones((2, 2))}}},
                   force=True)
    (in_dir / "meta.json").write_text('{"classes": ["building"]}')
    out_dir = tmp_path / "out"
    upgrade(str(in_dir), str(out_dir), [("old_name", "new_name")])
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(str(out_dir / "model_7"))
    assert "new_name" in restored["params"]
    assert np.allclose(restored["params"]["new_name"]["w"], 1.0)
    assert json.loads((out_dir / "meta.json").read_text())["classes"] \
        == ["building"]
