"""tools/prepare_dota.py: devkit scenes → patch COCO json round-trip."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "tools"))
from prepare_dota import parse_devkit_txt, prepare_split

from aidet_tpu.data.dota import DOTADataset, parse_patch_name


def _make_devkit_scene(root, scene, size=900, objs=()):
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "labelTxt"), exist_ok=True)
    import cv2
    img = np.full((size, size, 3), 64, np.uint8)
    lines = ["imagesource:GoogleEarth", "gsd:0.146343590398"]
    for (cx, cy, w, h, cls, diff) in objs:
        pts = np.asarray([[cx - w / 2, cy - h / 2],
                          [cx + w / 2, cy - h / 2],
                          [cx + w / 2, cy + h / 2],
                          [cx - w / 2, cy + h / 2]], np.float32)
        cv2.fillPoly(img, [pts.astype(np.int32)], (255, 255, 255))
        lines.append(" ".join(f"{v:.1f}" for v in pts.reshape(-1))
                     + f" {cls} {diff}")
    cv2.imwrite(os.path.join(root, "images", scene + ".png"), img)
    with open(os.path.join(root, "labelTxt", scene + ".txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


def test_parse_devkit_txt(tmp_path):
    p = tmp_path / "a.txt"
    p.write_text("imagesource:x\ngsd:0.1\n"
                 "0 0 10 0 10 10 0 10 plane 0\n"
                 "5 5 15 5 15 15 5 15 ship 1\n")
    polys, names, diff = parse_devkit_txt(str(p))
    assert polys.shape == (2, 8)
    assert names == ["plane", "ship"]
    assert diff.tolist() == [0, 1]


def test_prepare_and_load_round_trip(tmp_path):
    root = str(tmp_path / "devkit")
    out = str(tmp_path / "patched")
    _make_devkit_scene(root, "P0001", size=900, objs=[
        (100, 120, 60, 30, "plane", 0),
        (700, 800, 40, 40, "ship", 0),
        (450, 450, 30, 80, "harbor", 1),
    ])
    ann = prepare_split(root, out, split="train", patch=512,
                        overlap=128)

    data = json.load(open(ann))
    assert data["categories"][0]["name"] == "harbor"
    assert len(data["images"]) >= 2        # empties dropped by default
    for im in data["images"]:
        scene, x, y, scale = parse_patch_name(im["file_name"])
        assert scene == "P0001" and scale == 1.0

    ds = DOTADataset(ann_file=ann,
                     img_prefix=os.path.join(out, "train"))
    total = 0
    seen_crowd = 0
    for i in range(len(ds)):
        anns = ds.parse_anns(i)
        if len(anns["bboxes"]):
            assert "pointobbs" in anns
        n = len(anns["bboxes"]) + len(anns["bboxes_ignore"])
        seen_crowd += len(anns["bboxes_ignore"])
        total += n
        # patch-local coords stay inside the patch
        if len(anns["bboxes"]):
            assert anns["bboxes"].min() >= 0
            assert anns["bboxes"].max() <= 512
    assert total >= 3                      # every object landed somewhere
    assert seen_crowd >= 1                 # difficult → ignore


def test_prepare_multiscale(tmp_path):
    root = str(tmp_path / "devkit")
    out = str(tmp_path / "patched_ms")
    _make_devkit_scene(root, "P0002", size=600, objs=[
        (300, 300, 80, 40, "bridge", 0)])
    ann = prepare_split(root, out, split="train", patch=512,
                        overlap=128, scales=(0.5, 1.0))
    data = json.load(open(ann))
    scales = {parse_patch_name(im["file_name"])[3]
              for im in data["images"]}
    assert scales == {0.5, 1.0}


def test_synth_dota_generator(tmp_path):
    """tools/synth_dota.py emits devkit-format scenes that round-trip
    through prepare_split; realistic mode produces anisotropic angles."""
    import subprocess, sys, os
    out = tmp_path / "synth"
    subprocess.run([sys.executable,
                    os.path.join(os.path.dirname(__file__), "..",
                                 "tools", "synth_dota.py"),
                    str(out), "--scenes", "2", "--size", "600",
                    "--objs", "25", "--angle-mode", "realistic"],
                   check=True)
    assert (out / "images" / "P0000.png").exists()
    polys, names, diff = parse_devkit_txt(
        str(out / "labelTxt" / "P0000.txt"))
    assert len(polys) == 25 and len(names) == 25
    import numpy as np
    polys = np.asarray(polys, np.float32).reshape(-1, 4, 2)
    # recover angles of the first edge; realistic scenes must NOT be
    # uniform: road/grid classes cluster around few directions
    ang = np.arctan2(polys[:, 1, 1] - polys[:, 0, 1],
                     polys[:, 1, 0] - polys[:, 0, 0]) % (np.pi / 2)
    hist, _ = np.histogram(ang, bins=6, range=(0, np.pi / 2))
    assert hist.max() >= len(polys) * 0.3   # clustered, not uniform

    prepare_split(str(out), str(tmp_path / "prep"), "trainval",
                  patch=512, overlap=100)
    import json
    coco = json.load(open(tmp_path / "prep" / "trainval.json"))
    assert coco["annotations"], "no annotations survived tiling"
