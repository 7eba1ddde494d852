"""Offline BuildChange evaluation from saved results (parity:
reference tools/buildchange/buildchange_eval.py — re-evaluate a saved
results pkl without re-running inference, and
tools/buildchange/buildchange_test.py:124-126 — the --evaluation_city
swap that retargets a per-city config's test annotations at another
city for the cross-city generalization matrix)."""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def retarget_city(cfg, city: str):
    """Swap the config's own city for `city` in the test ann/img paths
    (parity: buildchange_test.py:124-126)."""
    own = cfg.get("city")
    if not own:
        raise SystemExit(
            "config has no `city` attribute; per-city retargeting "
            "needs one (see configs/buildchange_mask_rcnn_r50_*.py)")
    test = cfg.data["test"]
    test["ann_file"] = test["ann_file"].replace(own, city)
    test["img_prefix"] = test["img_prefix"].replace(own, city)
    return cfg


def main():
    p = argparse.ArgumentParser(
        description="Evaluate saved BuildChange results (COCO protocol)")
    p.add_argument("config")
    p.add_argument("results_pkl", help="pkl from tools/test.py --out")
    p.add_argument("--city", default=None,
                   help="evaluate against this city's val split instead "
                        "of the config's own (cross-city matrix)")
    p.add_argument("--eval", nargs="*", default=["bbox", "segm"],
                   choices=["bbox", "segm"])
    p.add_argument("--jsonfile-prefix", default=None,
                   help="also export COCO-format detection json here")
    args = p.parse_args()

    from aidet_tpu.data.builder import build_dataset
    from aidet_tpu.utils.config import Config
    from aidet_tpu.utils.platform import force_cpu
    force_cpu()   # numpy-only evaluation

    cfg = Config.fromfile(args.config)
    if args.city:
        cfg = retarget_city(cfg, args.city)
    ds = build_dataset(cfg.data["test"])

    with open(args.results_pkl, "rb") as f:
        saved = pickle.load(f)
    results = saved["results"] if isinstance(saved, dict) else saved
    if len(results) != len(ds):
        raise SystemExit(
            f"results ({len(results)}) vs dataset ({len(ds)}) length "
            "mismatch — the pkl was produced against a different split")

    if args.jsonfile_prefix:
        out = ds.results2json(results, args.jsonfile_prefix + ".bbox.json")
        print("exported", out)

    metrics = ds.evaluate(results)
    wanted = []
    if "bbox" in args.eval:
        wanted += ["mAP", "AP50", "AP75"]
    if "segm" in args.eval and "segm_mAP" in metrics:
        wanted += ["segm_mAP", "segm_AP50", "segm_AP75"]
    for k in wanted:
        print(f"{k:>12s}: {metrics[k]:.4f}")


if __name__ == "__main__":
    main()
