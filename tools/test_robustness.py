"""Corruption-robustness benchmark (parity: reference
tools/test_robustness.py + robustness_eval.py): run inference under
each corruption × severity, report per-run mAP plus the benchmark's
aggregate metrics P (clean AP), mPC (mean AP over corruptions at
severities 1..5) and rPC = mPC / P
(robustness_eval.py:get_results/get_distortions_from_file)."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--corruptions", nargs="*", default=None)
    p.add_argument("--severities", type=int, nargs="*",
                   default=[0, 1, 3, 5])
    p.add_argument("--max-images", type=int, default=50)
    p.add_argument("--out", default="robustness.json")
    args = p.parse_args()

    import numpy as np

    from aidet_tpu.apis.inference import init_detector
    from aidet_tpu.apis.test import run_inference
    from aidet_tpu.data.builder import build_dataset
    from aidet_tpu.data.transforms import (CORRUPTIONS, CORRUPTIONS_ALL,
                                           corrupt)
    from aidet_tpu.utils.logging import get_root_logger

    logger = get_root_logger()
    model, variables, cfg = init_detector(args.config, args.checkpoint)
    dataset = build_dataset(cfg.data["test"])
    # corruption groups (reference tools/test_robustness.py:278-313)
    groups = dict(
        benchmark=list(CORRUPTIONS),
        all=list(CORRUPTIONS_ALL),
        noise=["gaussian_noise", "shot_noise", "impulse_noise"],
        blur=["defocus_blur", "glass_blur", "motion_blur", "zoom_blur"],
        weather=["snow", "frost", "fog", "brightness"],
        digital=["contrast", "elastic_transform", "pixelate",
                 "jpeg_compression"],
        holdout=["speckle_noise", "gaussian_blur", "spatter", "saturate"])
    sel = args.corruptions
    if not sel:
        corruptions = list(CORRUPTIONS)
    elif len(sel) == 1 and sel[0] in groups:
        corruptions = groups[sel[0]]
    else:
        corruptions = sel

    class CorruptedDS:
        def __init__(self, base, name, severity, n):
            self.base = base
            self.name, self.severity = name, severity
            self.n = min(n, len(base))
            self.img_infos = base.img_infos[:self.n]

        def __len__(self):
            return self.n

        def img_path(self, i):
            return self.base.img_path(i)

    import cv2
    results = {}
    for name in ["clean"] + corruptions:
        for sev in ([0] if name == "clean" else args.severities):
            if name != "clean" and sev == 0:
                continue
            ds = CorruptedDS(dataset, name, sev, args.max_images)
            # monkey-patch loading through the corruption
            orig_imread = cv2.imread

            def patched(path, *a):
                img = orig_imread(path, *a)
                if img is not None and name != "clean":
                    img = corrupt(img, name, sev)
                return img
            cv2.imread = patched
            try:
                res, _ = run_inference(model, variables, ds, batch_size=4)
            finally:
                cv2.imread = orig_imread
            mean_dets = float(np.mean([r["valid"].sum() for r in res]))
            mean_score = float(np.mean(
                [r["scores"][r["valid"]].mean() if r["valid"].any()
                 else 0.0 for r in res]))
            key = f"{name}_s{sev}" if name != "clean" else "clean"
            results[key] = dict(mean_dets=mean_dets,
                                mean_score=mean_score)
            if hasattr(dataset, "evaluate"):
                ev = dataset.evaluate(res)
                results[key].update(
                    {k: float(v) for k, v in ev.items()
                     if isinstance(v, (int, float))})
            results[key].update(corruption=name, severity=sev)
            logger.info("%s: %s", key, results[key])

    # aggregate metrics (parity: robustness_eval.py — P on clean data,
    # mPC over corruptions x severities>=1, rPC = mPC / P)
    metric = next((m for m in ("mAP", "AP50")
                   if m in results.get("clean", {})), None)
    if metric is not None:
        p_clean = results["clean"][metric]
        per_corr = {}
        for key, r in results.items():
            if r["severity"] >= 1 and metric in r:
                per_corr.setdefault(r["corruption"], []).append(r[metric])
        if per_corr:
            mpc = float(np.mean(
                [np.mean(v) for v in per_corr.values()]))
            results["aggregate"] = dict(
                metric=metric, P=p_clean, mPC=mpc,
                rPC=float(mpc / p_clean) if p_clean > 0 else 0.0,
                corruption=None, severity=-1)
            logger.info("aggregate: %s", results["aggregate"])

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    logger.info("saved %s", args.out)


if __name__ == "__main__":
    main()
