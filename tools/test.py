"""Test / evaluation CLI (parity: reference tools/test.py +
tools/dota/dota_test.py: inference → format → merge → DOTA eval)."""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description="Test a detector")
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--out", default=None, help="save raw results (.pkl)")
    p.add_argument("--eval", nargs="*", default=["hbb", "obb"],
                   choices=["hbb", "obb"])
    p.add_argument("--submit-dir", default=None,
                   help="write DOTA submission txt files here")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--precompile", action="store_true",
                   help="lower+compile the exact predict program into "
                        "the persistent cache, then exit (no "
                        "checkpoint needed)")
    p.add_argument("--tta", action="store_true",
                   help="multi-scale/flip TTA per image, driven by the "
                        "config's tta = dict(scales=..., flip=...) "
                        "block (parity: MultiScaleFlipAug test "
                        "pipelines, e.g. the centermap ms protocol)")
    p.add_argument("--n-devices", type=int, default=None,
                   help="shard each batch over an n-device data mesh "
                        "(default: all visible devices when >1)")
    p.add_argument("--platform", default=os.environ.get("AIDET_PLATFORM"),
                   choices=["cpu", "tpu", "axon"],
                   help="pin the jax platform (e.g. cpu for off-TPU "
                        "validation; env var alone is not reliable — "
                        "see utils/platform.py)")
    return p.parse_args()


def main():
    args = parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from aidet_tpu.apis.inference import init_detector
    from aidet_tpu.apis.test import run_inference
    from aidet_tpu.core.rboxes import RBBOX_CODECS
    from aidet_tpu.data.builder import build_dataset
    from aidet_tpu.utils.logging import get_root_logger

    logger = get_root_logger()
    model, variables, cfg = init_detector(
        args.config, None if args.precompile else args.checkpoint)
    dataset = build_dataset(cfg.data["test"])
    import jax
    mesh = None
    # LOCAL devices only: each process feeds host-local numpy batches
    # of its own dataset shard, so the mesh must not span other hosts'
    # non-addressable chips (cross-host splitting is the
    # num_shards/shard_id axis below)
    n_dev = args.n_devices or jax.local_device_count()
    if n_dev > jax.local_device_count():
        raise SystemExit(
            f"--n-devices {n_dev} exceeds the {jax.local_device_count()}"
            " local devices (a silent truncation would shard over the"
            " wrong mesh while validating batch divisibility against"
            " the requested count)")
    if n_dev > 1:
        from jax.sharding import Mesh
        import numpy as np
        mesh = Mesh(np.asarray(jax.local_devices()[:n_dev]), ("data",))
        logger.info("sharding eval batches over %d local devices",
                    n_dev)
    if args.tta:
        import cv2

        from aidet_tpu.apis.tta import aug_test_image
        tta_cfg = dict(cfg.get("tta") or {})
        scales = tuple(tta_cfg.get("scales", (model.img_size,)))
        flip = bool(tta_cfg.get("flip", True))
        encode = (None if getattr(model, "mask_head", None)
                  else getattr(model, "rbbox_encode", None))
        logger.info("TTA: scales=%s flip=%s", scales, flip)
        results, names = [], []
        for i in range(len(dataset)):
            if i % jax.process_count() != jax.process_index():
                continue
            img = cv2.imread(dataset.img_path(i))
            m = aug_test_image(model, variables, img, scales=scales,
                               flip=flip, rbox_encode=encode)
            r = dict(boxes=m["boxes"], scores=m["scores"],
                     labels=m["labels"],
                     valid=np.ones(len(m["scores"]), bool))
            if "quads" in m:
                # already in quad (pointobb) form, fused by per-class
                # rotated NMS across variants — carries its own
                # scores/labels (the quad-side merge is independent of
                # the hbb-side merge)
                r.update(quads=m["quads"], quad_scores=m["quad_scores"],
                         quad_labels=m["quad_labels"])
            results.append(r)
            names.append(dataset.img_infos[i]["file_name"])
    elif args.precompile:
        run_inference(model, variables, dataset,
                      batch_size=args.batch_size, mesh=mesh,
                      pipeline_cfg=cfg.get("test_pipeline"),
                      precompile_only=True)
        logger.info("precompiled predict program")
        return
    else:
        # one shard per host process (parity: mmdet/apis/test.py:31-73)
        results, names = run_inference(
            model, variables, dataset, batch_size=args.batch_size,
            mesh=mesh, num_shards=jax.process_count(),
            shard_id=jax.process_index(),
            pipeline_cfg=cfg.get("test_pipeline"))
    logger.info("ran inference on %d images", len(results))
    if args.out:
        with open(args.out, "wb") as f:
            pickle.dump({"results": results, "names": names}, f)

    if hasattr(dataset, "merge_patches_to_scenes") and results:
        import jax.numpy as jnp

        # refine-head models emit refined thetaobb rboxes from predict
        # regardless of the first-stage encode (two_stage.py predict)
        if getattr(model, "rbbox_refine_head", None):
            encode = "thetaobb"
        else:
            encode = getattr(model, "rbbox_encode", "thetaobb")
        to_quad = RBBOX_CODECS[encode][3]
        for task in args.eval:
            dets = []
            from aidet_tpu.core.masks import masks_to_thetaobbs
            from aidet_tpu.core.rboxes import thetaobb2pointobb
            for r in results:
                if task == "obb" and "quads" in r:
                    # TTA path: quads come pre-fused with their own
                    # scores/labels
                    dets.append(dict(
                        boxes=np.asarray(r["quads"]),
                        scores=np.asarray(r["quad_scores"]),
                        labels=np.asarray(r["quad_labels"]),
                        valid=np.ones(len(r["quad_scores"]), bool)))
                    continue
                if task == "obb" and "rboxes" in r:
                    boxes = np.asarray(to_quad(jnp.asarray(r["rboxes"])))
                elif task == "obb" and "masks" in r:
                    # MaskOBB/CenterMapOBB: OBB from the predicted
                    # centermap/mask via min-area-rect
                    # (datasets/dota.py:160-196 segm2txt parity)
                    tobbs = masks_to_thetaobbs(
                        np.asarray(r["masks"]), np.asarray(r["boxes"]),
                        np.asarray(r["valid"]))
                    boxes = np.asarray(thetaobb2pointobb(
                        jnp.asarray(tobbs)))
                else:
                    boxes = np.asarray(r["boxes"])
                dets.append(dict(boxes=boxes, scores=r["scores"],
                                 labels=r["labels"], valid=r["valid"]))
            merged = dataset.merge_patches_to_scenes(dets, names, task=task)
            if args.submit_dir:
                dataset.format_results_txt(
                    merged, os.path.join(args.submit_dir, task), task=task)
            logger.info("%s: merged %d scenes", task, len(merged))


if __name__ == "__main__":
    main()
