"""Fold FrozenBN into convs for inference (parity: reference
tools/fuse_conv_bn.py)."""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ckpt", help="model pickle (from publish_model) or "
                               "orbax model_N dir")
    p.add_argument("out_file")
    args = p.parse_args()

    from aidet_tpu.utils.fuse_bn import fuse_conv_bn

    if os.path.isdir(args.ckpt):
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ckptr:
            variables = ckptr.restore(os.path.abspath(args.ckpt))
    else:
        with open(args.ckpt, "rb") as f:
            variables = pickle.load(f)
    fused = fuse_conv_bn(variables)
    with open(args.out_file, "wb") as f:
        pickle.dump(fused, f, protocol=4)
    print(f"fused checkpoint → {args.out_file}")


if __name__ == "__main__":
    main()
