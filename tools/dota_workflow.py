"""Full DOTA workflow runner (parity: reference tools/dota/dota_8.sh
family — stage-flagged train → test → eval → figure pipelines, as one
Python CLI instead of per-cluster shell wrappers).

Example:
    python tools/dota_workflow.py configs/dota_theta_obb_r50_fpn_1x.py \
        --stages train test eval --gt-json data/dota/val_scene_gt_obb.json
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

TOOLS = os.path.dirname(os.path.abspath(__file__))


def run(script, *argv):
    cmd = [sys.executable, os.path.join(TOOLS, script), *argv]
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--stages", nargs="+",
                   default=["train", "test", "eval"],
                   choices=["train", "test", "eval", "figures"])
    p.add_argument("--gt-json", default=None,
                   help="scene-level GT json for the eval stage")
    p.add_argument("--encode", default="auto",
                   help="rbox encoding for eval quad conversion; "
                        "'auto' reads model.rbbox_encode from the "
                        "config (rbbox_refine_head models emit refined "
                        "thetaobb regardless of the first-stage encode)")
    p.add_argument("--seed", type=int, default=None,
                   help="train-stage rng seed (run-to-run noise "
                        "estimation: same config, second seed)")
    p.add_argument("--total-epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--autoscale-lr", action="store_true",
                   help="scale config lr by n_devices/8 (train stage)")
    p.add_argument("--img-prefix", default=None,
                   help="patch image dir for the figures stage")
    args = p.parse_args()

    name = os.path.splitext(os.path.basename(args.config))[0]
    work = args.work_dir or f"work_dirs/{name}"
    results = os.path.join(work, "results.pkl")

    if args.encode == "auto":
        sys.path.insert(0, os.path.dirname(TOOLS))
        from aidet_tpu.utils.config import Config
        mcfg = Config.fromfile(args.config).get("model", {})
        args.encode = ("thetaobb" if mcfg.get("rbbox_refine_head")
                       else mcfg.get("rbbox_encode", "thetaobb"))
        print(f"[encode] auto -> {args.encode}", flush=True)

    if "train" in args.stages:
        extra = []
        if args.seed is not None:
            extra += ["--seed", str(args.seed)]
        if args.total_epochs:
            extra += ["--total-epochs", str(args.total_epochs)]
        if args.batch_size:
            extra += ["--batch-size", str(args.batch_size)]
        if args.autoscale_lr:
            extra += ["--autoscale-lr"]
        run("train.py", args.config, "--work-dir", work, *extra)
    if "test" in args.stages:
        extra = []
        if args.batch_size:
            # also governs test: large predict programs (e.g.
            # CenterMapNet's semantic-fusion RoI gather) can exceed
            # HBM at the default batch 8
            extra += ["--batch-size", str(args.batch_size)]
        run("test.py", args.config, "--checkpoint",
            os.path.join(work, "ckpt"), "--out", results,
            "--submit-dir", os.path.join(work, "submit"), *extra)
    if "eval" in args.stages:
        if not args.gt_json:
            p.error("--gt-json is required for the eval stage")
        for task in ("obb", "hbb"):
            gt = (args.gt_json.replace("_obb", f"_{task}")
                  if "_obb" in args.gt_json else args.gt_json)
            if task == "hbb" and "_obb" not in args.gt_json:
                # no sibling hbb gt derivable from the name: feeding
                # the OBB polygons into the hbb IoU would be garbage
                print(f"[skip] hbb eval: no *_hbb sibling of "
                      f"{args.gt_json}", flush=True)
                continue
            run("dota_eval.py", results, "--gt-json", gt, "--task",
                task, "--encode", args.encode,
                "--export", os.path.join(work, f"ap_{task}"))
    if "figures" in args.stages:
        if not args.img_prefix:
            p.error("--img-prefix is required for the figures stage")
        run("dota_paper.py", results, "--img-prefix", args.img_prefix,
            "--encode", args.encode,
            "--out-dir", os.path.join(work, "figures"))


if __name__ == "__main__":
    main()
