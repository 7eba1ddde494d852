"""Prepare DOTA-devkit data for training: tile scenes → patch COCO json.

Replaces the reference's external wwtool/DOTA_devkit offline step (the
jsons named in configs/dota/*.py `ann_file=...dota_trainval_v1_1.0_best_keypoint.json`
are produced by exactly this transform): read devkit scenes
(`images/*.png` + `labelTxt/*.txt`, lines
`x1 y1 x2 y2 x3 y3 x4 y4 class difficult`), slide a patch window over
each scene (optionally at several scales), keep objects centred in the
patch, and emit

  out_dir/images/{scene}__{scale}__{x}___{y}.png
  out_dir/{split}.json          (COCO dict with per-ann `pointobb`)

Patch names round-trip through aidet_tpu.data.dota.parse_patch_name, so
tools/test.py --merge-scenes + tools/dota_eval.py reconstitute
scene-level results directly.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from aidet_tpu.core.eval.class_names import DOTA_CLASSES
from aidet_tpu.data.tiling import tile_coords


def parse_devkit_txt(path: str):
    """One devkit labelTxt file → (pointobbs [N,8], names [N], difficult
    [N]). Header lines (imagesource:/gsd:) are skipped."""
    polys, names, diff = [], [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 9 or ":" in parts[0]:
                continue
            try:
                coords = [float(v) for v in parts[:8]]
            except ValueError:
                continue
            polys.append(coords)
            names.append(parts[8])
            diff.append(int(parts[9]) if len(parts) > 9 else 0)
    return (np.asarray(polys, np.float32).reshape(-1, 8), names,
            np.asarray(diff, np.int32))


def pointobb_to_xywh(p):
    """[8] pointobb → COCO xywh hbb."""
    xs, ys = p[0::2], p[1::2]
    x1, y1 = float(xs.min()), float(ys.min())
    return [x1, y1, float(xs.max()) - x1, float(ys.max()) - y1]


def pointobb_to_xyxy(p):
    xs, ys = p[0::2], p[1::2]
    return [round(float(xs.min()), 2), round(float(ys.min()), 2),
            round(float(xs.max()), 2), round(float(ys.max()), 2)]


def patch_annotations(polys, names, diff, x0, y0, patch, scale,
                      class_to_id):
    """Objects whose centre falls inside the patch, shifted to patch
    coords (the devkit's 'best keypoint' criterion keeps an object in
    the single patch that contains its centre most centrally; centre
    containment is the standard approximation)."""
    out = []
    if not len(polys):
        return out
    sp = polys * scale
    cx = sp[:, 0::2].mean(1)
    cy = sp[:, 1::2].mean(1)
    keep = ((cx >= x0) & (cx < x0 + patch)
            & (cy >= y0) & (cy < y0 + patch))
    for i in np.nonzero(keep)[0]:
        if names[i] not in class_to_id:
            continue
        p = sp[i].copy()
        p[0::2] -= x0
        p[1::2] -= y0
        full_area = abs(np.dot(p[0::2], np.roll(p[1::2], -1))
                        - np.dot(p[1::2], np.roll(p[0::2], -1))) / 2
        p = np.clip(p, 0, patch - 1)
        # border-clipped remnants: the devkit's ImgSplit drops
        # instances reduced to slivers (log-ratio regression targets
        # explode on ~0-px sides) and marks heavily-truncated ones
        # difficult.  Same policy on the vertex-clipped quad.
        pts = p.reshape(4, 2)
        clip_area = abs(np.dot(p[0::2], np.roll(p[1::2], -1))
                        - np.dot(p[1::2], np.roll(p[0::2], -1))) / 2
        ratio = clip_area / max(full_area, 1e-6)
        spans = pts.max(0) - pts.min(0)
        if clip_area < 4.0 or min(spans) < 2.0 or ratio < 0.2:
            continue
        truncated = ratio < 0.6
        out.append(dict(
            category_id=class_to_id[names[i]],
            bbox=pointobb_to_xywh(p),
            pointobb=[round(float(v), 2) for v in p],
            segmentation=[[round(float(v), 2) for v in p]],
            area=float(
                abs(np.dot(p[0::2], np.roll(p[1::2], -1))
                    - np.dot(p[1::2], np.roll(p[0::2], -1))) / 2),
            iscrowd=int(diff[i] > 0 or truncated),
        ))
    return out


def prepare_split(data_root: str, out_dir: str, split: str = "trainval",
                  patch: int = 1024, overlap: int = 200,
                  scales=(1.0,), keep_empty: bool = False,
                  classes=DOTA_CLASSES):
    import cv2

    img_dir = os.path.join(data_root, "images")
    ann_dir = os.path.join(data_root, "labelTxt")
    # patches land under <out_dir>/<split>/ so multiple splits prepared
    # into one out_dir never collide (scene names restart at P0000 per
    # split) and configs can use img_prefix=<out_dir>/<split>
    out_img_dir = os.path.join(out_dir, split)
    os.makedirs(out_img_dir, exist_ok=True)
    class_to_id = {c: i + 1 for i, c in enumerate(classes)}

    images, annotations = [], []
    img_id = ann_id = 0
    scenes = sorted(os.path.splitext(f)[0] for f in os.listdir(img_dir)
                    if f.lower().endswith((".png", ".jpg", ".tif",
                                           ".bmp", ".jpeg")))
    for scene in scenes:
        src = next(os.path.join(img_dir, f) for f in os.listdir(img_dir)
                   if os.path.splitext(f)[0] == scene)
        img = cv2.imread(src, cv2.IMREAD_COLOR)
        txt = os.path.join(ann_dir, scene + ".txt")
        if os.path.exists(txt):
            polys, names, diff = parse_devkit_txt(txt)
        else:
            polys = np.zeros((0, 8), np.float32)
            names, diff = [], np.zeros((0,), np.int32)
        for scale in scales:
            im = (img if scale == 1.0 else cv2.resize(
                img, None, fx=scale, fy=scale,
                interpolation=cv2.INTER_LINEAR))
            h, w = im.shape[:2]
            for x0, y0 in tile_coords(h, w, patch, overlap):
                anns = patch_annotations(polys, names, diff, x0, y0,
                                         patch, scale, class_to_id)
                if not anns and not keep_empty:
                    continue
                name = f"{scene}__{scale}__{x0}___{y0}.png"
                tile = np.zeros((patch, patch, 3), im.dtype)
                crop = im[y0:y0 + patch, x0:x0 + patch]
                tile[:crop.shape[0], :crop.shape[1]] = crop
                cv2.imwrite(os.path.join(out_img_dir, name), tile)
                img_id += 1
                images.append(dict(id=img_id, file_name=name,
                                   width=patch, height=patch))
                for a in anns:
                    ann_id += 1
                    a.update(id=ann_id, image_id=img_id)
                    annotations.append(a)

    coco = dict(
        images=images,
        annotations=annotations,
        categories=[dict(id=i + 1, name=c)
                    for i, c in enumerate(classes)],
    )
    out_json = os.path.join(out_dir, f"{split}.json")
    with open(out_json, "w") as f:
        json.dump(coco, f)

    # scene-level GT jsons for tools/dota_eval.py ({scene: {boxes,
    # labels}}; obb boxes are the raw 8-pt polys, hbb their envelope)
    scene_obb, scene_hbb = {}, {}
    for scene in scenes:
        txt = os.path.join(ann_dir, scene + ".txt")
        if not os.path.exists(txt):
            continue
        polys, names_s, diff = parse_devkit_txt(txt)
        keep = [i for i, n in enumerate(names_s) if n in class_to_id]
        labels = [class_to_id[names_s[i]] - 1 for i in keep]
        # difficult flags ride along: dota_eval routes difficult GT to
        # the ignore set (devkit protocol, core/eval/dota.py)
        difficult = [bool(diff[i]) for i in keep]
        scene_obb[scene] = dict(
            boxes=[[round(float(v), 2) for v in polys[i]]
                   for i in keep], labels=labels,
            difficult=difficult)
        scene_hbb[scene] = dict(
            boxes=[pointobb_to_xyxy(polys[i]) for i in keep],
            labels=labels, difficult=difficult)
    for task, gt in (("obb", scene_obb), ("hbb", scene_hbb)):
        with open(os.path.join(out_dir,
                               f"{split}_scene_gt_{task}.json"),
                  "w") as f:
            json.dump(gt, f)

    print(f"{split}: {len(images)} patches, {len(annotations)} "
          f"annotations → {out_json}")
    return out_json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("data_root",
                   help="devkit split dir with images/ + labelTxt/")
    p.add_argument("out_dir")
    p.add_argument("--split", default="trainval")
    p.add_argument("--patch", type=int, default=1024)
    p.add_argument("--overlap", type=int, default=200)
    p.add_argument("--scales", default="1.0",
                   help="comma-separated scene scales (ms: 0.5,1.0,1.5)")
    p.add_argument("--keep-empty", action="store_true")
    args = p.parse_args()
    prepare_split(args.data_root, args.out_dir, args.split, args.patch,
                  args.overlap,
                  tuple(float(s) for s in args.scales.split(",")),
                  args.keep_empty)


if __name__ == "__main__":
    main()
