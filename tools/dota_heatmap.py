"""CenterMap heatmap visualization (parity: reference
tools/dota/dota_heatmap.py + dota_paper.py figure helpers): overlay
the predicted centerness maps / semantic maps on the input patch."""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("images", nargs="+")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--out-dir", default="work_dirs/heatmaps")
    p.add_argument("--alpha", type=float, default=0.5)
    args = p.parse_args()

    import cv2
    import jax
    import numpy as np

    from aidet_tpu.apis.inference import init_detector
    from aidet_tpu.data.pipeline import TestPipeline

    model, variables, cfg = init_detector(args.config, args.checkpoint)
    pipe = TestPipeline(img_size=getattr(model, "img_size", 1024))
    predict = jax.jit(functools.partial(model.apply, method="predict"))

    os.makedirs(args.out_dir, exist_ok=True)
    for path in args.images:
        img = cv2.imread(path)
        if img is None:
            continue
        s = pipe(img)
        out = jax.device_get(predict(
            variables, s["imgs"][None], s["img_shapes"][None],
            np.asarray([s["scale_factors"]], np.float32)))
        if "masks" not in out:
            print("model has no mask/centermap head; nothing to draw")
            return
        v = out["valid"][0]
        heat = np.zeros(img.shape[:2], np.float32)
        masks = out["masks"][0]
        boxes = out["boxes"][0]
        for m, b, ok in zip(masks, boxes, v):
            if not ok:
                continue
            x1, y1, x2, y2 = [int(round(float(t))) for t in b]
            x1, y1 = max(x1, 0), max(y1, 0)
            x2 = min(x2, img.shape[1] - 1)
            y2 = min(y2, img.shape[0] - 1)
            if x2 <= x1 or y2 <= y1:
                continue
            patch = cv2.resize(np.asarray(m, np.float32),
                               (x2 - x1 + 1, y2 - y1 + 1))
            heat[y1:y2 + 1, x1:x2 + 1] = np.maximum(
                heat[y1:y2 + 1, x1:x2 + 1], patch)
        heat_u8 = (np.clip(heat, 0, 1) * 255).astype(np.uint8)
        colored = cv2.applyColorMap(heat_u8, cv2.COLORMAP_JET)
        vis = cv2.addWeighted(img, 1 - args.alpha, colored, args.alpha, 0)
        out_path = os.path.join(args.out_dir, os.path.basename(path))
        cv2.imwrite(out_path, vis)
        print("wrote", out_path)


if __name__ == "__main__":
    main()
