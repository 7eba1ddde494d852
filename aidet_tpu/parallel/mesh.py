"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL DDP runtime
(SURVEY.md §2.3/§2.4: torch.distributed.launch + MMDistributedDataParallel,
apis/train.py:111-115, core/utils/dist_utils.py): a 1-D ``data`` mesh
axis over ICI/DCN; the train step is jitted with batch sharded on
``data`` and params replicated, so XLA inserts the gradient psum that
DDP's all-reduce performed explicitly.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices: int | None = None,
                axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first n devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a pytree of [B, ...] arrays with B sharded over the mesh."""
    def put(x):
        spec = P(axis_name) if getattr(x, "ndim", 0) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/opt state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
