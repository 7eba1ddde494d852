"""Serialized model export (parity: reference tools/pytorch2onnx.py —
the TPU-era equivalent exports the jitted predict function as
portable StableHLO via jax.export)."""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--out", default="model.stablehlo")
    p.add_argument("--batch", type=int, default=1)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from aidet_tpu.apis.inference import init_detector

    model, variables, cfg = init_detector(args.config, args.checkpoint)
    size = getattr(model, "img_size", 1024)
    imgs = jnp.zeros((args.batch, size, size, 3), jnp.float32)
    shapes = jnp.tile(jnp.asarray([[size, size]], jnp.float32),
                      (args.batch, 1))

    def fn(imgs, shapes):
        return model.apply(variables, imgs, shapes, method="predict")

    exported = jax.export.export(jax.jit(fn))(imgs, shapes)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported {args.out} ({len(blob) / 1e6:.1f} MB, "
          f"platforms={exported.platforms})")


if __name__ == "__main__":
    main()
