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


def convert_resnet(state_dict: dict, depth: int = 50,
                   stem_space_to_depth: bool = False):
    """torch resnet state_dict → (params, batch_stats) subtrees matching
    aidet_tpu.models.backbones.resnet.ResNet naming.

    ``stem_space_to_depth=True`` relays the 7x7 stem kernel into the
    numerically-identical [4,4,4C,F] space-to-depth layout
    (resnet.stem_s2d_weights) for backbones built with that flag.
    """
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
    stem = w("conv1.weight")
    if stem_space_to_depth:
        from aidet_tpu.models.backbones.resnet import stem_s2d_weights
        stem = stem_s2d_weights(stem)
    params["stem_conv"] = dict(kernel=stem)
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


def _conv(sd, key):
    """torch OIHW conv weight → flax HWIO kernel."""
    return np.transpose(np.asarray(sd[key]), (2, 3, 1, 0))


def _dense(sd, key):
    """torch [out, in] linear weight → flax [in, out]."""
    return np.asarray(sd[key]).T


def _dense_from_chw(sd, key, c, h, w):
    """First FC after roi flatten: torch flattens (C, H, W), flax
    flattens (H, W, C) — permute the input axis accordingly."""
    m = np.asarray(sd[key])
    out = m.shape[0]
    return m.reshape(out, c, h, w).transpose(0, 2, 3, 1).reshape(out, -1).T


def convert_fpn(sd, num_levels: int = 4):
    """neck.{lateral_convs,fpn_convs}.{i}.conv.* → _neck/{lateral,fpn}{i}
    (parity: mmdet/models/necks/fpn.py:86-129)."""
    p = {}
    for i in range(num_levels):
        p[f"lateral{i}"] = dict(
            kernel=_conv(sd, f"neck.lateral_convs.{i}.conv.weight"),
            bias=np.asarray(sd[f"neck.lateral_convs.{i}.conv.bias"]))
        p[f"fpn{i}"] = dict(
            kernel=_conv(sd, f"neck.fpn_convs.{i}.conv.weight"),
            bias=np.asarray(sd[f"neck.fpn_convs.{i}.conv.bias"]))
    # RetinaNet-style extra stride-2 convs (fpn.py:137-160)
    j = num_levels
    while f"neck.fpn_convs.{j}.conv.weight" in sd:
        p[f"extra{j - num_levels}"] = dict(
            kernel=_conv(sd, f"neck.fpn_convs.{j}.conv.weight"),
            bias=np.asarray(sd[f"neck.fpn_convs.{j}.conv.bias"]))
        j += 1
    return p


def convert_rpn(sd):
    """rpn_head.rpn_{conv,cls,reg} → _rpn (anchor_heads/rpn_head.py:19-23)."""
    return {
        name: dict(kernel=_conv(sd, f"rpn_head.{name}.weight"),
                   bias=np.asarray(sd[f"rpn_head.{name}.bias"]))
        for name in ("rpn_conv", "rpn_cls", "rpn_reg")
    }


def convert_fc_head(sd, prefix: str, roi_size: int = 7,
                    in_channels: int = 256):
    """{prefix}.shared_fcs.{i} / fc_cls / fc_reg → SharedFC(R)BBoxHead
    params (bbox_heads/convfc_bbox_head.py:52-75, rbbox_head.py:76-156)."""
    p = {}
    i = 0
    while f"{prefix}.shared_fcs.{i}.weight" in sd:
        key = f"{prefix}.shared_fcs.{i}.weight"
        if i == 0:
            kernel = _dense_from_chw(sd, key, in_channels,
                                     roi_size, roi_size)
        else:
            kernel = _dense(sd, key)
        p[f"shared_fc{i}"] = dict(
            kernel=kernel,
            bias=np.asarray(sd[f"{prefix}.shared_fcs.{i}.bias"]))
        i += 1
    for name in ("fc_cls", "fc_reg"):
        p[name] = dict(kernel=_dense(sd, f"{prefix}.{name}.weight"),
                       bias=np.asarray(sd[f"{prefix}.{name}.bias"]))
    return p


def convert_detector(state_dict: dict, depth: int = 50,
                     roi_size: int = 7, stem_space_to_depth: bool = False):
    """Full two-stage detector state_dict → flax variables for
    aidet_tpu TwoStageDetector (Faster R-CNN / RBBoxRCNN families).

    Maps backbone + FPN + RPN + bbox_head (+ rbbox_head when present).
    Returns {"params": ..., "batch_stats": ...} with the module names
    the flagship uses (_backbone/_neck/_rpn/_bbox_head/_rbbox_head).
    Unmapped source keys are returned for caller inspection."""
    bsd = {k[len("backbone."):]: v for k, v in state_dict.items()
           if k.startswith("backbone.")}
    bb_params, bb_stats = convert_resnet(
        bsd, depth, stem_space_to_depth=stem_space_to_depth)
    params = {"_backbone": bb_params,
              "_neck": convert_fpn(state_dict),
              "_rpn": convert_rpn(state_dict),
              "_bbox_head": convert_fc_head(state_dict, "bbox_head",
                                            roi_size)}
    if any(k.startswith("rbbox_head.") for k in state_dict):
        params["_rbbox_head"] = convert_fc_head(
            state_dict, "rbbox_head", roi_size)
    stats = {"_backbone": bb_stats}
    mapped_prefixes = ("backbone.", "neck.", "rpn_head.", "bbox_head.",
                       "rbbox_head.")
    unmapped = [k for k in state_dict
                if not k.startswith(mapped_prefixes)]
    return dict(params=params, batch_stats=stats), unmapped


def load_torch_state_dict(path: str, strip_backbone: bool = True) -> dict:
    """Load a .pth/.pt state dict as numpy (torch cpu is available)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        k = k.replace("module.", "")
        if strip_backbone:
            k = k.replace("backbone.", "")
        if hasattr(v, "numpy"):
            out[k] = v.numpy()
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("torch_ckpt")
    p.add_argument("out_file")
    p.add_argument("--depth", type=int, default=50)
    p.add_argument("--stem-space-to-depth", action="store_true",
                   help="relayout the 7x7 stem for backbones built "
                        "with stem_space_to_depth=True")
    p.add_argument("--scope", choices=("backbone", "detector"),
                   default="backbone",
                   help="convert just the ResNet backbone, or a full "
                        "two-stage detector checkpoint")
    args = p.parse_args()
    if args.scope == "detector":
        sd = load_torch_state_dict(args.torch_ckpt, strip_backbone=False)
        variables, unmapped = convert_detector(
            sd, args.depth,
            stem_space_to_depth=args.stem_space_to_depth)
        with open(args.out_file, "wb") as f:
            pickle.dump(variables, f, protocol=4)
        print(f"converted detector → {args.out_file}")
        if unmapped:
            print(f"unmapped keys ({len(unmapped)}): "
                  + ", ".join(sorted(unmapped)[:10]))
        return
    sd = load_torch_state_dict(args.torch_ckpt)
    params, stats = convert_resnet(
        sd, args.depth, stem_space_to_depth=args.stem_space_to_depth)
    with open(args.out_file, "wb") as f:
        pickle.dump(dict(params=params, batch_stats=stats), f, protocol=4)
    print(f"converted backbone → {args.out_file}")


if __name__ == "__main__":
    main()
