"""Checkpoint publication (parity: reference tools/publish_model.py):
strip optimizer state, keep model weights + meta, append a content
hash to the filename."""

from __future__ import annotations

import argparse
import hashlib
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ckpt_dir", help="checkpoint dir (with model_N/)")
    p.add_argument("out_file", help="output .pkl path")
    p.add_argument("--step", type=int, default=None)
    args = p.parse_args()

    import jax
    import numpy as np

    from aidet_tpu.utils.checkpoint import latest_step

    step = args.step or latest_step(args.ckpt_dir, "model_")
    # restore without a target: read the raw pytree
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(
            os.path.abspath(os.path.join(args.ckpt_dir, f"model_{step}")))
    state = jax.tree.map(np.asarray, state)

    blob = pickle.dumps(state, protocol=4)
    sha = hashlib.sha256(blob).hexdigest()[:8]
    root, ext = os.path.splitext(args.out_file)
    out = f"{root}-{sha}{ext or '.pkl'}"
    with open(out, "wb") as f:
        f.write(blob)
    n = sum(x.size for x in jax.tree.leaves(state))
    print(f"published {out} ({n / 1e6:.2f}M params, sha256 {sha})")


if __name__ == "__main__":
    main()
