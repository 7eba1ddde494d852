"""Convert torchvision/mmdet ResNet checkpoints to aidet_tpu params.

Replaces the reference's pretrained-URL loading + upgrade tooling
(pretrained='torchvision://resnet50', tools/upgrade_model_version.py,
tools/detectron2pytorch.py): maps a torch state_dict (file) onto this
repo's flax parameter tree for the ResNet backbone.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

TORCH_STAGE_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3),
                      50: (3, 4, 6, 3), 101: (3, 4, 23, 3),
                      152: (3, 8, 36, 3)}


def convert_resnet(state_dict: dict, depth: int = 50):
    """torch resnet state_dict → (params, batch_stats) subtrees matching
    aidet_tpu.models.backbones.resnet.ResNet naming."""
    def w(conv_key):
        # torch OIHW → flax HWIO
        return np.transpose(np.asarray(state_dict[conv_key]), (2, 3, 1, 0))

    def bn(prefix):
        return (
            dict(scale=np.asarray(state_dict[f"{prefix}.weight"]),
                 bias=np.asarray(state_dict[f"{prefix}.bias"])),
            dict(mean=np.asarray(state_dict[f"{prefix}.running_mean"]),
                 var=np.asarray(state_dict[f"{prefix}.running_var"])))

    params: dict = {}
    stats: dict = {}
    params["stem_conv"] = dict(kernel=w("conv1.weight"))
    params["stem_bn"], stats["stem_bn"] = bn("bn1")

    blocks = TORCH_STAGE_BLOCKS[depth]
    bottleneck = depth >= 50
    for s in range(4):
        for b in range(blocks[s]):
            src = f"layer{s + 1}.{b}"
            dst = f"layer{s + 1}_block{b}"
            p: dict = {}
            st: dict = {}
            n_convs = 3 if bottleneck else 2
            for c in range(1, n_convs + 1):
                p[f"conv{c}"] = dict(kernel=w(f"{src}.conv{c}.weight"))
                p[f"bn{c}"], st[f"bn{c}"] = bn(f"{src}.bn{c}")
            if f"{src}.downsample.0.weight" in state_dict:
                p["ds_conv"] = dict(
                    kernel=w(f"{src}.downsample.0.weight"))
                p["ds_bn"], st["ds_bn"] = bn(f"{src}.downsample.1")
            params[dst] = p
            stats[dst] = st
    return params, stats


def load_torch_state_dict(path: str) -> dict:
    """Load a .pth/.pt state dict as numpy (torch cpu is available)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        k = k.replace("module.", "").replace("backbone.", "")
        if hasattr(v, "numpy"):
            out[k] = v.numpy()
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("torch_ckpt")
    p.add_argument("out_file")
    p.add_argument("--depth", type=int, default=50)
    args = p.parse_args()
    sd = load_torch_state_dict(args.torch_ckpt)
    params, stats = convert_resnet(sd, args.depth)
    with open(args.out_file, "wb") as f:
        pickle.dump(dict(params=params, batch_stats=stats), f, protocol=4)
    n = sum(np.asarray(v["kernel"]).size
            for v in params.values() if "kernel" in v)
    print(f"converted backbone → {args.out_file}")


if __name__ == "__main__":
    main()
