"""Offline DOTA evaluation from saved results (parity: reference
tools/dota/dota_eval.py — evaluate a saved .pkl without re-running
inference)."""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("results_pkl", help="pkl from tools/test.py --out")
    p.add_argument("--gt-json", required=True,
                   help="scene-level gt json: {scene: {boxes, labels}}")
    p.add_argument("--task", default="obb", choices=["obb", "hbb"])
    p.add_argument("--encode", default="thetaobb")
    p.add_argument("--export", default=None,
                   help="prefix for csv/xlsx AP export")
    args = p.parse_args()

    import numpy as np
    from aidet_tpu.utils.platform import force_cpu
    force_cpu()   # numpy-dominated post-processing; never needs the accelerator

    from aidet_tpu.core.eval.class_names import DOTA_CLASSES
    from aidet_tpu.core.eval.dota import dota_eval, export_dota_results
    from aidet_tpu.core.rboxes import RBBOX_CODECS
    from aidet_tpu.data.dota import DOTADataset

    with open(args.results_pkl, "rb") as f:
        saved = pickle.load(f)
    results, names = saved["results"], saved["names"]

    ds = DOTADataset.__new__(DOTADataset)  # formatting-only instance
    ds.CLASSES = DOTA_CLASSES

    import jax.numpy as jnp
    to_quad = RBBOX_CODECS[args.encode][3]
    dets = []
    from aidet_tpu.core.masks import masks_to_thetaobbs
    from aidet_tpu.core.rboxes import thetaobb2pointobb
    for r in results:
        if args.task == "obb" and "rboxes" in r:
            boxes = np.asarray(to_quad(jnp.asarray(r["rboxes"])))
        elif args.task == "obb" and "masks" in r:
            # mask-family results: OBB via min-area-rect (segm2txt
            # parity, datasets/dota.py:160-196)
            tobbs = masks_to_thetaobbs(
                np.asarray(r["masks"]), np.asarray(r["boxes"]),
                np.asarray(r["valid"]))
            boxes = np.asarray(thetaobb2pointobb(jnp.asarray(tobbs)))
        else:
            boxes = np.asarray(r["boxes"])
        dets.append(dict(boxes=boxes, scores=r["scores"],
                         labels=r["labels"], valid=r["valid"]))
    merged = ds.merge_patches_to_scenes(dets, names, task=args.task)

    with open(args.gt_json) as f:
        raw = json.load(f)
    gts = {k: dict(boxes=np.asarray(v["boxes"], np.float32),
                   labels=np.asarray(v["labels"], np.int32),
                   **({"difficult": np.asarray(v["difficult"], bool)}
                      if "difficult" in v else {}))
           for k, v in raw.items()}
    mean_ap, aps = dota_eval(merged, gts, DOTA_CLASSES, task=args.task)
    for k, v in sorted(aps.items()):
        print(f"{k:>22s}: {v:.4f}")
    print(f"{'mAP':>22s}: {mean_ap:.4f}")
    if args.export:
        path = export_dota_results(aps, mean_ap, args.export)
        print("exported", path)


if __name__ == "__main__":
    main()
