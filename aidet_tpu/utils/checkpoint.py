"""Orbax checkpointing (parity: mmcv CheckpointHook + runner.resume,
SURVEY.md §5.4): saves the full TrainState for resume plus a
model-only artifact (params + batch_stats) for inference, with a meta
json (classes, epoch) mirroring the reference's checkpoint meta
(tools/train.py:131-137)."""

from __future__ import annotations

import json
import os

import jax


def save_checkpoint(ckpt_dir: str, state, step: int, meta: dict | None = None):
    import orbax.checkpoint as ocp
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    host_state = jax.device_get(state)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(ckpt_dir, f"step_{step}"), host_state,
                   force=True)
        if hasattr(host_state, "params"):
            model_only = {"params": host_state.params,
                          "batch_stats": host_state.batch_stats}
            ckptr.save(os.path.join(ckpt_dir, f"model_{step}"),
                       model_only, force=True)
    if meta is not None:
        meta = dict(meta, step=step)
        with open(os.path.join(ckpt_dir, "meta.json"), "w") as f:
            json.dump(meta, f)


def latest_step(ckpt_dir: str, prefix: str = "step_") -> int:
    # orbax leaves '<name>.orbax-checkpoint-tmp-<ts>' dirs behind on
    # interrupted saves — only purely numeric suffixes are completed
    # checkpoints (resume must not crash exactly when it's needed)
    steps = [int(d[len(prefix):]) for d in os.listdir(ckpt_dir)
             if d.startswith(prefix) and d[len(prefix):].isdigit()]
    if not steps:
        raise FileNotFoundError(f"no '{prefix}*' checkpoints in {ckpt_dir}")
    return max(steps)


def load_checkpoint(ckpt_dir: str, target, step: int | None = None,
                    prefix: str = "step_"):
    """Restore a checkpoint into ``target``'s structure.

    Use prefix='model_' with a {'params','batch_stats'} target for
    inference-time weight loading.
    """
    import orbax.checkpoint as ocp
    ckpt_dir = os.path.abspath(ckpt_dir)
    if step is None:
        step = latest_step(ckpt_dir, prefix)
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(
            os.path.join(ckpt_dir, f"{prefix}{step}"), target)
    meta_path = os.path.join(ckpt_dir, "meta.json")
    meta = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta
