"""Model complexity CLI (parity: reference tools/get_flops.py)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--shape", type=int, nargs="+", default=[1024, 1024])
    args = p.parse_args()

    from aidet_tpu.models import build_detector
    from aidet_tpu.utils.config import Config
    from aidet_tpu.utils.flops import (flops_to_string,
                                       get_model_complexity_info,
                                       params_to_string)

    cfg = Config.fromfile(args.config)
    model = build_detector(cfg.model, train_cfg=cfg.get("train_cfg"),
                           test_cfg=cfg.get("test_cfg"))
    h, w = (args.shape * 2)[:2]
    flops, params, byts = get_model_complexity_info(
        model, (1, h, w, 3), method="extract_feat")
    print(f"input shape: (1, {h}, {w}, 3)")
    print(f"backbone+neck flops: {flops_to_string(flops)}")
    print(f"params: {params_to_string(params)}")
    print(f"bytes accessed: {byts / 1e9:.2f} GB")


if __name__ == "__main__":
    main()
