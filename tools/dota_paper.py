"""Paper-quality per-class OBB renders (parity: reference
tools/dota/dota_paper.py): clean filled-outline detection figures for
selected classes/images, no score text, thick per-class palette lines —
rendered from a saved results pkl like dota_compare.py.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dota_demo import DOTA_COLORS  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("results_pkl", help="pkl from tools/test.py --out")
    p.add_argument("--img-prefix", required=True)
    p.add_argument("--classes", nargs="+", default=None,
                   help="restrict to these class names (default: all)")
    p.add_argument("--images", nargs="+", default=None,
                   help="restrict to these patch file names")
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--encode", default="thetaobb")
    p.add_argument("--alpha", type=float, default=0.25,
                   help="fill opacity inside each OBB")
    p.add_argument("--out-dir", default="work_dirs/paper")
    args = p.parse_args()

    import cv2
    from aidet_tpu.utils.platform import force_cpu
    force_cpu()   # numpy-dominated post-processing; never needs the accelerator
    import jax.numpy as jnp
    import numpy as np

    from aidet_tpu.core.eval.class_names import DOTA_CLASSES
    from aidet_tpu.core.rboxes import RBBOX_CODECS

    with open(args.results_pkl, "rb") as f:
        saved = pickle.load(f)
    to_quad = RBBOX_CODECS[args.encode][3]
    cls_ids = (None if args.classes is None
               else {DOTA_CLASSES.index(c) for c in args.classes})

    os.makedirs(args.out_dir, exist_ok=True)
    n_done = 0
    for name, r in zip(saved["names"], saved["results"]):
        if args.images is not None and name not in args.images:
            continue
        path = os.path.join(args.img_prefix, name)
        img = cv2.imread(path)
        if img is None:
            continue
        labels = np.asarray(r["labels"])
        v = (np.asarray(r["valid"], bool)
             & (np.asarray(r["scores"]) > args.score_thr))
        if cls_ids is not None:
            v &= np.isin(labels, list(cls_ids))
        if not v.any():
            continue
        vis = img.copy()
        overlay = img.copy()
        if "rboxes" in r:
            # decode full fixed-size array then mask (single jit shape)
            quads = np.asarray(to_quad(jnp.asarray(
                np.asarray(r["rboxes"]))))[v]
            polys = [np.round(q.reshape(4, 2)).astype(np.int32)
                     for q in quads]
        else:
            polys = []
            for b in np.asarray(r["boxes"])[v]:
                x1, y1, x2, y2 = (int(b[0]), int(b[1]), int(b[2]),
                                  int(b[3]))
                polys.append(np.asarray(
                    [[x1, y1], [x2, y1], [x2, y2], [x1, y2]],
                    np.int32))
        for pts, l in zip(polys, labels[v]):
            color = DOTA_COLORS[int(l) % len(DOTA_COLORS)]
            cv2.fillPoly(overlay, [pts], color)
            cv2.polylines(vis, [pts], True, color, 3)
        vis = cv2.addWeighted(overlay, args.alpha, vis,
                              1 - args.alpha, 0)
        cv2.imwrite(os.path.join(args.out_dir, name), vis)
        n_done += 1
    print(f"{n_done} figures → {args.out_dir}")


if __name__ == "__main__":
    main()
