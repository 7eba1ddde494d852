"""Batch error analysis over the per-city BuildChange matrix (parity:
reference tools/buildchange/multi_error_analysis.py — loop
coco_error_analysis over every per-city model's saved results)."""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--models", nargs="*",
                   default=["buildchange_mask_rcnn_r50_shanghai",
                            "buildchange_mask_rcnn_r50_beijing",
                            "buildchange_mask_rcnn_r50_haerbin"])
    p.add_argument("--results-root", default="results/buildchange")
    args = p.parse_args()

    for model in args.models:
        city = model.rsplit("_", 1)[-1]
        pkl = os.path.join(args.results_root, model,
                           f"{model}_{city}.pkl")
        cfg = os.path.join(HERE, "..", "configs", f"{model}.py")
        out = os.path.join(args.results_root, model, "analysis.csv")
        if not os.path.exists(pkl):
            print(f"skip {model}: no results at {pkl}")
            continue
        print(f"=== {model} ({city}) ===")
        subprocess.run([sys.executable,
                        os.path.join(HERE, "coco_error_analysis.py"),
                        pkl, cfg, "--out", out], check=True)


if __name__ == "__main__":
    main()
