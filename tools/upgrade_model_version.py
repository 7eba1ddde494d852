"""Upgrade checkpoints saved by older aidet_tpu versions (parity:
reference tools/upgrade_model_version.py — rewrite state-dict keys so
checkpoints trained before a breaking rename keep loading).

The orbax model artifact is a {'params', 'batch_stats'} pytree; this
tool restores it structure-free, applies path renames, and re-saves.
Built-in rules cover the historical renames in this repo; ad-hoc ones
can be added with --rename OLD=NEW (substring match on the joined
'/'-path, applied to every leaf whose path contains OLD).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# historical breaking renames (old substring -> new substring), applied
# in order.  Keep appending here when a module is renamed.
BUILTIN_RENAMES = [
    # round-2: lateral conv modules in FPN gained an explicit index
    # namespace ('lateral_0' style) — identity mapping today; listed as
    # the documented example of the rule format.
    ("lateral_convs_", "lateral_"),
]


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (str(k),))
    else:
        yield prefix, tree


def _unflatten(items):
    root: dict = {}
    for path, leaf in items:
        node = root
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf
    return root


def upgrade(in_dir: str, out_dir: str, renames):
    import orbax.checkpoint as ocp

    from aidet_tpu.utils.checkpoint import latest_step

    step = latest_step(in_dir, prefix="model_")
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(
            os.path.abspath(os.path.join(in_dir, f"model_{step}")))
        out_items = []
        n_renamed = 0
        for path, leaf in _flatten(tree):
            joined = "/".join(path)
            for old, new in renames:
                if old in joined:
                    joined = joined.replace(old, new)
                    n_renamed += 1
            out_items.append((tuple(joined.split("/")), leaf))
        os.makedirs(out_dir, exist_ok=True)
        ckptr.save(os.path.abspath(os.path.join(out_dir, f"model_{step}")),
                   _unflatten(out_items), force=True)
    meta = os.path.join(in_dir, "meta.json")
    if os.path.exists(meta):
        import shutil
        shutil.copy(meta, os.path.join(out_dir, "meta.json"))
    print(f"upgraded {in_dir} -> {out_dir} "
          f"(step {step}, {n_renamed} keys renamed)")


def main():
    p = argparse.ArgumentParser(description="Upgrade checkpoint version")
    p.add_argument("in_dir", help="input ckpt dir (with model_<step>/)")
    p.add_argument("out_dir", help="output ckpt dir")
    p.add_argument("--rename", nargs="*", default=[],
                   help="extra OLD=NEW path-substring renames")
    args = p.parse_args()
    renames = list(BUILTIN_RENAMES)
    for r in args.rename:
        old, new = r.split("=", 1)
        renames.append((old, new))
    upgrade(args.in_dir, args.out_dir, renames)


if __name__ == "__main__":
    main()
