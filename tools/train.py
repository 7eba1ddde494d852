"""Training CLI (parity: reference tools/train.py:64-151)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description="Train a detector")
    p.add_argument("config", help="config file path")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--resume-from", default=None)
    p.add_argument("--load-from", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--total-epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--n-devices", type=int, default=None)
    p.add_argument("--precompile", action="store_true",
                   help="lower+compile the exact train step into the "
                        "persistent cache (no accelerator steps), then "
                        "exit — warms a later real run")
    p.add_argument("--autoscale-lr", action="store_true",
                   help="linearly scale lr with device count "
                        "(parity: reference tools/train.py:81-83, "
                        "8-device base)")
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
    # multi-process env (from tools/dist_train.sh / slurm_train.sh)
    # must be consumed before ANYTHING touches the jax backend —
    # collect_env and even get_root_logger (rank gating) initialize it
    from aidet_tpu.parallel.dist import init_distributed
    init_distributed()
    from aidet_tpu.apis.train import train_detector
    from aidet_tpu.data.builder import build_dataset
    from aidet_tpu.data.pipeline import TrainPipeline
    from aidet_tpu.models import build_detector
    from aidet_tpu.utils.config import Config
    from aidet_tpu.utils.logging import collect_env, get_root_logger

    cfg = Config.fromfile(args.config)
    work_dir = args.work_dir or cfg.get(
        "work_dir", f"work_dirs/{os.path.splitext(os.path.basename(args.config))[0]}")
    logger = get_root_logger(os.path.join(work_dir, "train.log"))
    logger.info("env: %s", collect_env())
    logger.info("config: %s", cfg.filename)

    from aidet_tpu.utils.precision import apply_fp16_cfg
    model_cfg = apply_fp16_cfg(cfg, dict(cfg.model))
    if cfg.get("fp16"):
        logger.info("fp16 config -> bf16 compute dtype")
    # ship raw uint8 pixels and normalize inside the jitted step by
    # default (4x less host->device traffic; models/preprocess.py);
    # custom pipeline constants propagate to the model's img_norm
    pipe_cfg = dict(cfg.get("train_pipeline", {}))
    pipe_cfg.setdefault("device_normalize", True)
    if pipe_cfg["device_normalize"] and any(
            k in pipe_cfg for k in ("mean", "std", "to_rgb")):
        from aidet_tpu.models.preprocess import DEFAULT_MEAN, DEFAULT_STD
        model_cfg.setdefault("img_norm", dict(
            mean=list(pipe_cfg.get("mean", DEFAULT_MEAN)),
            std=list(pipe_cfg.get("std", DEFAULT_STD)),
            to_rgb=pipe_cfg.get("to_rgb", True)))
    model = build_detector(model_cfg, train_cfg=cfg.get("train_cfg"),
                           test_cfg=cfg.get("test_cfg"))
    dataset = build_dataset(cfg.data["train"])

    run_cfg = dict(cfg.get("run", {}))
    run_cfg.setdefault("seed", args.seed)
    run_cfg.setdefault("optimizer", cfg.get("optimizer", {}))
    run_cfg.setdefault("lr_config", cfg.get("lr_config", {}))
    if args.total_epochs:
        run_cfg["total_epochs"] = args.total_epochs
        # A config's lr step schedule is written for its own
        # total_epochs (e.g. 1x = steps (8, 11) of 12).  When the CLI
        # stretches/shrinks the run, scale the decay epochs by the
        # same ratio (the mmdet 1x->2x convention applied
        # automatically) so long runs don't spend 80% of their epochs
        # at the post-decay lr.
        cfg_epochs = cfg.get("total_epochs", 12)
        if args.total_epochs != cfg_epochs:
            lrc = dict(run_cfg.get("lr_config") or {})
            ratio = args.total_epochs / cfg_epochs
            steps = []
            for s in lrc.get("step", (8, 11)):
                v = max(1, round(s * ratio))
                if steps and v <= steps[-1]:
                    # rounding collisions would silently drop a decay
                    # stage (build_lr_schedule keys boundaries)
                    v = steps[-1] + 1
                steps.append(v)
            steps = tuple(steps)
            lrc["step"] = steps
            run_cfg["lr_config"] = lrc
            logger.info("total-epochs %d (config %d): lr steps -> %s",
                        args.total_epochs, cfg_epochs, steps)
    if args.batch_size:
        run_cfg["batch_size"] = args.batch_size
    elif cfg.get("batch_size"):
        # config-level global batch (imgs_per_gpu * gpus in the
        # reference's terms); CLI flag wins
        run_cfg.setdefault("batch_size", cfg.get("batch_size"))
    if args.n_devices:
        run_cfg["n_devices"] = args.n_devices
    run_cfg.setdefault("total_epochs", cfg.get("total_epochs", 12))
    if args.autoscale_lr:
        import jax
        n_dev = args.n_devices or jax.device_count()
        opt = dict(run_cfg["optimizer"])
        opt["lr"] = opt.get("lr", 0.02) * n_dev / 8.0
        run_cfg["optimizer"] = opt
        logger.info("autoscale-lr: %d devices -> lr %.5f", n_dev,
                    opt["lr"])
    pipe_cfg.setdefault("img_size", getattr(model, "img_size", 1024))
    run_cfg["pipeline"] = TrainPipeline(**pipe_cfg)

    train_detector(model, dataset, run_cfg, work_dir=work_dir,
                   logger=logger, resume_from=args.resume_from,
                   load_from=args.load_from,
                   precompile_only=args.precompile)


if __name__ == "__main__":
    main()
