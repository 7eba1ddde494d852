"""DOTA visualization demo (parity: reference tools/dota/dota_demo.py
+ dota_compare.py): draw HBB + OBB detections on patches."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# the reference's per-class DOTA palette (show_result, centermap_obb.py:452)
DOTA_COLORS = [
    (54, 67, 244), (99, 30, 233), (176, 39, 156), (183, 58, 103),
    (181, 81, 63), (243, 150, 33), (212, 188, 0), (136, 150, 0),
    (80, 175, 76), (74, 195, 139), (57, 220, 205), (59, 235, 255),
    (0, 152, 255), (34, 87, 255), (72, 85, 121)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("images", nargs="+")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--out-dir", default="work_dirs/demo")
    args = p.parse_args()

    import cv2
    import jax.numpy as jnp
    import numpy as np

    from aidet_tpu.apis.inference import init_detector
    from aidet_tpu.apis.tta import aug_test_image  # noqa: F401 (API)
    from aidet_tpu.core.rboxes import RBBOX_CODECS
    from aidet_tpu.data.pipeline import TestPipeline

    model, variables, cfg = init_detector(args.config, args.checkpoint)
    import functools

    import jax
    predict = jax.jit(functools.partial(model.apply, method="predict"))
    pipe = TestPipeline(img_size=getattr(model, "img_size", 1024))
    encode = getattr(model, "rbbox_encode", "thetaobb")
    to_quad = RBBOX_CODECS[encode][3]

    os.makedirs(args.out_dir, exist_ok=True)
    for path in args.images:
        img = cv2.imread(path)
        if img is None:
            print("skip unreadable:", path)
            continue
        s = pipe(img)
        out = predict(variables, s["imgs"][None], s["img_shapes"][None],
                      np.asarray([s["scale_factors"]], np.float32))
        out = jax.device_get(out)
        v = out["valid"][0] & (out["scores"][0] > args.score_thr)
        boxes = out["boxes"][0][v]
        labels = out["labels"][0][v]
        scores = out["scores"][0][v]
        vis = img.copy()
        for b, l, sc in zip(boxes, labels, scores):
            color = DOTA_COLORS[int(l) % len(DOTA_COLORS)]
            cv2.rectangle(vis, (int(b[0]), int(b[1])),
                          (int(b[2]), int(b[3])), color, 2)
            cv2.putText(vis, f"{int(l)}:{sc:.2f}",
                        (int(b[0]), max(int(b[1]) - 3, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.45, color)
        if "rboxes" in out:
            quads = np.asarray(to_quad(jnp.asarray(out["rboxes"][0][v])))
            for q, l in zip(quads, labels):
                pts = np.round(q.reshape(4, 2)).astype(np.int32)
                cv2.polylines(vis, [pts], True,
                              DOTA_COLORS[int(l) % len(DOTA_COLORS)], 2)
        out_path = os.path.join(args.out_dir, os.path.basename(path))
        cv2.imwrite(out_path, vis)
        print("wrote", out_path, f"({int(v.sum())} dets)")


if __name__ == "__main__":
    main()
