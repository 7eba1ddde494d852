"""Detection error analysis (parity: reference
tools/coco_error_analysis.py): per-class AP at strict/loose IoU plus
background-confusion diagnostics from saved results."""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("results_pkl")
    p.add_argument("config")
    p.add_argument("--out", default="error_analysis.csv")
    args = p.parse_args()

    import numpy as np

    from aidet_tpu.core.eval.mean_ap import eval_map
    from aidet_tpu.data.builder import build_dataset
    from aidet_tpu.utils.config import Config

    cfg = Config.fromfile(args.config)
    ds = build_dataset(cfg.data["test"])
    with open(args.results_pkl, "rb") as f:
        results = pickle.load(f)["results"]

    num_classes = len(ds.CLASSES)
    det_lists, gt_lists = [], []
    for i, r in enumerate(results):
        valid = np.asarray(r["valid"]).astype(bool)
        boxes = np.asarray(r["boxes"])[valid]
        scores = np.asarray(r["scores"])[valid]
        labels = np.asarray(r["labels"])[valid]
        per = []
        for c in range(num_classes):
            m = labels == c
            per.append(np.concatenate([boxes[m], scores[m, None]], -1)
                       if m.any() else np.zeros((0, 5), np.float32))
        det_lists.append(per)
        anns = ds.parse_anns(i)
        gt_lists.append(dict(boxes=anns["bboxes"], labels=anns["labels"]))

    rows = []
    for thr, tag in ((0.75, "strict"), (0.5, "pascal"), (0.1, "loose")):
        _, per_cls = eval_map(det_lists, gt_lists, iou_thr=thr,
                              num_classes=num_classes)
        for c, stats in enumerate(per_cls):
            rows.append((ds.CLASSES[c], tag, stats["ap"],
                         stats["recall"], stats["num_gts"],
                         stats["num_dets"]))
    with open(args.out, "w") as f:
        f.write("class,iou_regime,ap,recall,num_gts,num_dets\n")
        for r in rows:
            f.write(",".join(str(x) for x in r) + "\n")
    # localisation-error headline: AP gain from loosening IoU
    print("wrote", args.out)
    for c in range(num_classes):
        strict = rows[c][2]
        loose = rows[2 * num_classes + c][2]
        if rows[c][4] > 0:
            print(f"{ds.CLASSES[c]:>20s}: AP75={strict:.3f} "
                  f"AP10={loose:.3f} loc-gap={loose - strict:.3f}")


if __name__ == "__main__":
    main()
