"""Per-class GT-vs-prediction comparison panels (parity: reference
tools/dota/dota_compare.py — which re-runs the detector per image; here
the panels are rendered from a saved results pkl, so one inference pass
feeds eval, submission AND figures).

For every requested class: pick the patches containing it, draw GT
OBBs/HBBs (green) on the left half and predictions (per-class palette,
score-labelled) on the right, save side-by-side panels.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dota_demo import DOTA_COLORS  # noqa: E402


def draw_dets(img, r, cls_id, score_thr, to_quad):
    import cv2
    import jax.numpy as jnp
    import numpy as np
    vis = img.copy()
    v = (np.asarray(r["valid"], bool)
         & (np.asarray(r["scores"]) > score_thr)
         & (np.asarray(r["labels"]) == cls_id))
    color = DOTA_COLORS[cls_id % len(DOTA_COLORS)]
    if "rboxes" in r and to_quad is not None:
        # decode the full fixed-size det array THEN mask — keeps the
        # jitted codec at one shape across images (no per-image
        # recompiles)
        quads = np.asarray(to_quad(jnp.asarray(
            np.asarray(r["rboxes"]))))[v]
        for q, sc in zip(quads, np.asarray(r["scores"])[v]):
            pts = np.round(q.reshape(4, 2)).astype(np.int32)
            cv2.polylines(vis, [pts], True, color, 2)
            cv2.putText(vis, f"{sc:.2f}", tuple(pts[0]),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.4, color)
    else:
        for b, sc in zip(np.asarray(r["boxes"])[v],
                         np.asarray(r["scores"])[v]):
            cv2.rectangle(vis, (int(b[0]), int(b[1])),
                          (int(b[2]), int(b[3])), color, 2)
            cv2.putText(vis, f"{sc:.2f}", (int(b[0]), int(b[1]) - 3),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.4, color)
    return vis


def draw_gt(img, anns, cls_id):
    import cv2
    import numpy as np
    vis = img.copy()
    labels = np.asarray(anns["labels"])
    sel = labels == cls_id + 1            # dataset labels are 1-based
    pobbs = anns.get("pointobbs")
    if pobbs is not None and len(pobbs):
        for q in np.asarray(pobbs)[sel[:len(pobbs)]]:
            pts = np.round(q.reshape(4, 2)).astype(np.int32)
            cv2.polylines(vis, [pts], True, (0, 255, 0), 2)
    else:
        for b in np.asarray(anns["bboxes"])[sel]:
            cv2.rectangle(vis, (int(b[0]), int(b[1])),
                          (int(b[2]), int(b[3])), (0, 255, 0), 2)
    return vis


def main():
    p = argparse.ArgumentParser()
    p.add_argument("results_pkl", help="pkl from tools/test.py --out")
    p.add_argument("--ann-file", required=True)
    p.add_argument("--img-prefix", required=True)
    p.add_argument("--classes", nargs="+",
                   default=["swimming-pool", "helicopter"])
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--encode", default="thetaobb")
    p.add_argument("--max-images", type=int, default=20)
    p.add_argument("--out-dir", default="work_dirs/compare")
    args = p.parse_args()

    from aidet_tpu.utils.platform import force_cpu
    force_cpu()   # numpy post-processing; never needs the accelerator

    import cv2
    import numpy as np

    from aidet_tpu.core.eval.class_names import DOTA_CLASSES
    from aidet_tpu.core.rboxes import RBBOX_CODECS
    from aidet_tpu.data.dota import DOTADataset

    with open(args.results_pkl, "rb") as f:
        saved = pickle.load(f)
    results = saved["results"]
    by_name = {n: r for n, r in zip(saved["names"], results)}
    to_quad = RBBOX_CODECS[args.encode][3]

    ds = DOTADataset(ann_file=args.ann_file,
                     img_prefix=args.img_prefix)
    for cls in args.classes:
        cls_id = DOTA_CLASSES.index(cls)
        out_dir = os.path.join(args.out_dir, cls)
        os.makedirs(out_dir, exist_ok=True)
        n_done = 0
        for i in range(len(ds)):
            anns = ds.parse_anns(i)
            if not np.any(np.asarray(anns["labels"]) == cls_id + 1):
                continue
            name = anns["filename"]
            if name not in by_name:
                continue
            img = cv2.imread(ds.img_path(i))
            panel = np.concatenate(
                [draw_gt(img, anns, cls_id),
                 draw_dets(img, by_name[name], cls_id,
                           args.score_thr, to_quad)], axis=1)
            cv2.imwrite(os.path.join(out_dir, name), panel)
            n_done += 1
            if n_done >= args.max_images:
                break
        print(f"{cls}: {n_done} panels → {out_dir}")


if __name__ == "__main__":
    main()
