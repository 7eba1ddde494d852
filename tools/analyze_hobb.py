"""Quantify the hobb encoding's sort-boundary discontinuity.

The hobb representation (reference transforms.py:73-91 thetaobb2hobb:
best-point-sorted first edge + height) regresses the FIRST SORTED edge
of the box.  The sort (transforms.py:118-134 pointobb_best_point_sort)
picks the cyclic corner roll closest to the axis-aligned template, so
an infinitesimal rotation across the sort's decision boundary swaps
which physical edge is "first" — the regression targets jump
discontinuously while the underlying box barely moves.  theta and
point encodings only jump at the angle wrap (-pi/2 <-> 0).

This tool measures three things:

1. ANGLE SWEEP: encode a w x h box against its own envelope proposal
   over a fine theta sweep; report the number and size of target jumps
   per encoding (hobb vs theta vs point).
2. DATASET EXPOSURE: the fraction of devkit gts whose best-point sort
   flips under a +/- eps rotation (they sit at a target cliff during
   training: nearby augmentations/matched proposals see contradictory
   targets).
3. JUMP RATIO: for each gt, the target-space distance between theta
   and theta+0.5deg under each codec — the heavy tail is hobb's
   learning problem.

Usage:
  python tools/analyze_hobb.py [--ann data/dota_e2e/train_patches.json]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np


def _setup_jax():
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    return jax


def targets_for(thetaobb, encode):
    """Encode thetaobb gts against their own HBB envelopes."""
    import jax.numpy as jnp

    from aidet_tpu.core.rboxes import (RBBOX_CODECS, pointobb2bbox,
                                       thetaobb2hobb, thetaobb2pointobb)
    pts = thetaobb2pointobb(thetaobb)
    prop = pointobb2bbox(pts)
    if encode == "hobb":
        gt = thetaobb2hobb(thetaobb)
    elif encode == "pointobb":
        gt = pts
    else:
        gt = thetaobb
    _, enc_fn, _, _ = RBBOX_CODECS[encode]
    return np.asarray(enc_fn(prop, jnp.asarray(gt)))


def angle_sweep(w=60.0, h=None, aspect=1.2, n=1801):
    import jax.numpy as jnp  # noqa: F401  (jax initialised by caller)
    h = h or w / aspect
    th = np.linspace(-np.pi / 2, 0.0, n, endpoint=False)
    boxes = np.stack([np.full(n, 100.0), np.full(n, 100.0),
                      np.full(n, w), np.full(n, h), th], -1)
    out = {}
    for enc in ("thetaobb", "pointobb", "hobb"):
        t = targets_for(boxes.astype(np.float32), enc)
        jump = np.linalg.norm(np.diff(t, axis=0), axis=-1)
        # sweep step is ~0.05deg; a continuous codec moves O(1e-2)
        out[enc] = dict(
            median_step=float(np.median(jump)),
            n_jumps=int((jump > 0.5).sum()),
            max_jump=float(jump.max()))
    return out


def dataset_exposure(ann_file, eps_deg=1.0):
    import jax.numpy as jnp

    from aidet_tpu.core.rboxes import (pointobb2bbox,
                                       pointobb2thetaobb,
                                       thetaobb2pointobb)

    d = json.load(open(ann_file))
    polys = np.array([a["segmentation"][0] for a in d["annotations"]],
                     np.float32)
    cats = np.array([a["category_id"] for a in d["annotations"]])
    tobb = np.asarray(pointobb2thetaobb(jnp.asarray(polys)))

    def best_roll(tb):
        pts = thetaobb2pointobb(jnp.asarray(tb))
        bbox = pointobb2bbox(pts)
        xmin, ymin, xmax, ymax = (bbox[..., i] for i in range(4))
        ref = jnp.stack([xmin, ymin, xmax, ymin, xmax, ymax,
                         xmin, ymax], axis=-1)
        rolls = jnp.stack([jnp.roll(pts, 2 * s, axis=-1)
                           for s in range(4)], axis=-2)
        dist = jnp.sum((rolls - ref[..., None, :]) ** 2, axis=-1)
        return np.asarray(jnp.argmin(dist, axis=-1))

    eps = np.deg2rad(eps_deg)
    r0 = best_roll(tobb)
    flip = np.zeros(len(tobb), bool)
    for s in (-eps, eps):
        tb = tobb.copy()
        tb[:, 4] = np.clip(tb[:, 4] + s, -np.pi / 2, -1e-6)
        flip |= best_roll(tb) != r0

    # target jump under a 0.5deg rotation, per codec
    tb2 = tobb.copy()
    tb2[:, 4] = np.clip(tb2[:, 4] + np.deg2rad(0.5), -np.pi / 2, -1e-6)
    ratios = {}
    for enc in ("thetaobb", "pointobb", "hobb"):
        t0 = targets_for(tobb, enc)
        t1 = targets_for(tb2, enc)
        dd = np.linalg.norm(t1 - t0, axis=-1)
        ratios[enc] = dict(median=float(np.median(dd)),
                           p95=float(np.percentile(dd, 95)),
                           max=float(dd.max()),
                           frac_gt_05=float((dd > 0.5).mean()))
    per_class = {}
    for c in np.unique(cats):
        per_class[int(c)] = float(flip[cats == c].mean())
    return dict(n=len(tobb), flip_frac=float(flip.mean()),
                per_class_flip=per_class, jump_under_half_deg=ratios)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ann", default="data/dota_e2e/train_patches.json")
    ap.add_argument("--eps-deg", type=float, default=1.0)
    args = ap.parse_args()
    _setup_jax()

    print("== angle sweep (target jump across a 90deg rotation) ==")
    for aspect in (1.05, 1.2, 2.0, 4.0):
        res = angle_sweep(aspect=aspect)
        row = "  aspect %.2f:" % aspect
        for enc in ("thetaobb", "pointobb", "hobb"):
            r = res[enc]
            row += "  %s jumps>0.5: %d (max %.2f)" % (
                enc, r["n_jumps"], r["max_jump"])
        print(row)

    print("== dataset exposure (%s) ==" % args.ann)
    res = dataset_exposure(args.ann, args.eps_deg)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
