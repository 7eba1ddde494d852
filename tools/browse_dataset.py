"""Dataset browser (parity: reference tools/browse_dataset.py): dump
annotated images to disk for visual inspection."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--split", default="train")
    p.add_argument("--out-dir", default="work_dirs/browse")
    p.add_argument("--num", type=int, default=20)
    args = p.parse_args()

    import cv2
    import numpy as np

    from aidet_tpu.data.builder import build_dataset
    from aidet_tpu.utils.config import Config

    cfg = Config.fromfile(args.config)
    dataset = build_dataset(cfg.data[args.split])
    os.makedirs(args.out_dir, exist_ok=True)
    classes = getattr(dataset, "CLASSES", ())
    for i in range(min(args.num, len(dataset))):
        img = cv2.imread(dataset.img_path(i))
        if img is None:
            continue
        anns = dataset.parse_anns(i)
        if "pointobbs" in anns:
            for p8 in anns["pointobbs"]:
                pts = np.round(p8.reshape(4, 2)).astype(np.int32)
                cv2.polylines(img, [pts], True, (0, 0, 255), 2)
        for box, lbl in zip(anns["bboxes"], anns["labels"]):
            x1, y1, x2, y2 = [int(v) for v in box]
            cv2.rectangle(img, (x1, y1), (x2, y2), (0, 255, 0), 1)
            name = classes[lbl - 1] if lbl - 1 < len(classes) else str(lbl)
            cv2.putText(img, name, (x1, max(y1 - 3, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.4, (0, 255, 0))
        out = os.path.join(args.out_dir, os.path.basename(
            dataset.img_infos[i]["file_name"]))
        cv2.imwrite(out, img)
        print("wrote", out)


if __name__ == "__main__":
    main()
