"""Synthetic DOTA-devkit scene generator for end-to-end pipeline
drives (zero-egress stand-in for real DOTA imagery).

Emits ``images/*.png`` + ``labelTxt/*.txt`` (8-point polygons, class,
difficulty) consumable by tools/prepare_dota.py.

Two angle regimes:
  --angle-mode uniform    every object rotated uniformly (the round-2
                          set; near-square hulls make the h-encoding
                          ambiguous)
  --angle-mode realistic  DOTA-like anisotropic angle/aspect structure:
                          per-scene dominant "road"/"quay" directions,
                          class-conditional aspect ratios, grid-aligned
                          courts, isotropic tanks (whose OBB the DOTA
                          devkit treats as HBB — dota.py:302-303
                          forces storage-tank to horizontal boxes)
"""

from __future__ import annotations

import argparse
import os

import numpy as np

# class → (aspect lo, aspect hi, size lo, size hi, angle regime)
#   'road'  : concentrated around a per-scene dominant direction
#   'any'   : uniform
#   'grid'  : axis-aligned or perpendicular (courts, diamonds)
#   'iso'   : near-square (tanks, roundabouts) — angle uninformative
REALISTIC = {
    "plane":              (1.0, 1.3, 40, 90, "any"),
    "ship":               (2.5, 5.0, 25, 90, "road"),
    "storage-tank":       (1.0, 1.1, 25, 60, "iso"),
    "baseball-diamond":   (1.0, 1.2, 60, 110, "grid"),
    "tennis-court":       (1.8, 2.2, 45, 80, "grid"),
    "basketball-court":   (1.6, 1.9, 50, 90, "grid"),
    "ground-track-field": (1.4, 1.8, 90, 160, "grid"),
    "harbor":             (3.5, 7.0, 60, 160, "road"),
    "bridge":             (3.0, 8.0, 50, 150, "road"),
    "large-vehicle":      (2.2, 3.8, 18, 45, "road"),
    "small-vehicle":      (1.8, 2.6, 10, 24, "road"),
    "helicopter":         (1.2, 1.6, 30, 60, "any"),
    "roundabout":         (1.0, 1.1, 40, 90, "iso"),
    "soccer-ball-field":  (1.4, 1.7, 70, 130, "grid"),
    "swimming-pool":      (1.5, 2.5, 25, 70, "any"),
}


def _quad(cx, cy, w, h, theta):
    c, s = np.cos(theta), np.sin(theta)
    dx = np.asarray([-w / 2, w / 2, w / 2, -w / 2])
    dy = np.asarray([-h / 2, -h / 2, h / 2, h / 2])
    x = cx + c * dx - s * dy
    y = cy + s * dx + c * dy
    return np.stack([x, y], -1)              # [4, 2]


def gen_scene(rng, size, n_objs, angle_mode, classes):
    """Returns (img uint8 [size, size, 3], list of (quad, cls, diff))."""
    import cv2
    img = rng.randint(50, 90, (size, size, 3)).astype(np.uint8)
    # low-frequency background texture
    tex = cv2.resize(rng.rand(size // 32, size // 32).astype(np.float32),
                     (size, size), interpolation=cv2.INTER_CUBIC)
    img = np.clip(img + (tex[..., None] - 0.5) * 40, 0, 255).astype(
        np.uint8)

    # per-scene dominant directions (roads / quays)
    dirs = rng.uniform(-np.pi / 2, 0, size=2)
    objs = []
    for _ in range(n_objs):
        cls = classes[rng.randint(len(classes))]
        alo, ahi, slo, shi, regime = REALISTIC[cls]
        if angle_mode == "uniform":
            theta = rng.uniform(-np.pi / 2, -0.01)
            aspect = rng.uniform(1.2, 2.0)
        else:
            aspect = rng.uniform(alo, ahi)
            if regime == "road":
                theta = dirs[rng.randint(2)] + rng.normal(0, 0.06)
            elif regime == "grid":
                theta = (rng.randint(2) * (np.pi / 2)
                         + rng.normal(0, 0.03))
            elif regime == "iso":
                theta = rng.uniform(-np.pi / 2, 0)
            else:
                theta = rng.uniform(-np.pi / 2, 0)
            # fold into the devkit convention [-pi/2, 0)
            theta = -(abs(theta) % (np.pi / 2)) - 1e-3
        h = rng.uniform(slo, shi)
        w = h * aspect
        # keep the rotated extent inside the scene: with w = h*aspect
        # up to 7x, the old bounds inverted (low > high, numpy samples
        # garbage) and gt polygons landed far off-canvas while the
        # rendered fill clipped. Bound by the half-diagonal (covers
        # any rotation) and shrink oversized objects to fit.
        diag = float(np.hypot(w, h))
        if diag > size - 20.0:
            fit = (size - 20.0) / diag
            w *= fit
            h *= fit
            diag = size - 20.0
        half = diag / 2 + 5
        cx = rng.uniform(half, size - half)
        cy = rng.uniform(half, size - half)
        quad = _quad(cx, cy, w, h, theta)
        color = tuple(int(v) for v in rng.randint(120, 255, 3))
        cv2.fillPoly(img, [quad.astype(np.int32)], color)
        # light edge shading so objects aren't flat color
        cv2.polylines(img, [quad.astype(np.int32)], True,
                      tuple(int(v * 0.6) for v in color), 2)
        objs.append((quad, cls, int(rng.rand() < 0.05)))
    return img, objs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out_root")
    p.add_argument("--scenes", type=int, default=12)
    p.add_argument("--size", type=int, default=900)
    p.add_argument("--objs", type=int, default=60)
    p.add_argument("--angle-mode", choices=("uniform", "realistic"),
                   default="realistic")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--classes", default=None,
                   help="comma list; default = all 15 DOTA classes")
    args = p.parse_args()

    import cv2
    classes = (args.classes.split(",") if args.classes
               else list(REALISTIC))
    os.makedirs(os.path.join(args.out_root, "images"), exist_ok=True)
    os.makedirs(os.path.join(args.out_root, "labelTxt"), exist_ok=True)
    rng = np.random.RandomState(args.seed)
    for i in range(args.scenes):
        scene = f"P{i:04d}"
        img, objs = gen_scene(rng, args.size, args.objs,
                              args.angle_mode, classes)
        cv2.imwrite(os.path.join(args.out_root, "images",
                                 scene + ".png"), img)
        lines = ["imagesource:synthetic", "gsd:0.15"]
        for quad, cls, diff in objs:
            lines.append(" ".join(f"{v:.1f}" for v in quad.reshape(-1))
                         + f" {cls} {diff}")
        with open(os.path.join(args.out_root, "labelTxt",
                               scene + ".txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
    print(f"wrote {args.scenes} scenes ({args.angle_mode}) → "
          f"{args.out_root}")


if __name__ == "__main__":
    main()
