"""Multi-host distributed runtime.

TPU-native replacement for the reference's launcher + NCCL process
group (mmcv init_dist in tools/train.py:47-51,86-90, rank-sharded
DistributedGroupSampler datasets/samplers/group_sampler.py:50-137, and
the eval result gather mmdet/apis/test.py:74-146):

  - :func:`init_distributed` wraps ``jax.distributed.initialize`` —
    one call per host process; afterwards ``jax.devices()`` spans the
    whole slice and a data mesh over it rides ICI/DCN.
  - :func:`local_batch_to_global` turns each process's local batch
    shard into one globally-sharded jax.Array (the SPMD replacement
    for DistributedSampler feeding per-rank DataLoaders).
  - :func:`gather_results` all-gathers fixed-shape per-image result
    arrays across processes and restores dataset order (the
    collect_results_cpu/gpu parity, without pickle shards).
"""

from __future__ import annotations

import os

import jax
import numpy as np


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     local_device_ids=None):
    """Initialize the multi-process runtime when one is configured.

    With no arguments this auto-detects the environment
    (``jax.distributed.initialize()`` understands TPU pod metadata and
    the ``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/
    ``JAX_PROCESS_ID`` env vars); single-process runs skip
    initialization entirely.

    Returns (process_index, process_count).
    """
    global _initialized
    explicit = coordinator_address is not None
    env = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not _initialized and (
            explicit or env
            or int(os.environ.get("JAX_NUM_PROCESSES", "1")) > 1):
        # jax.distributed.initialize auto-detects SLURM/TPU-pod envs
        # but NOT these manual vars — pass them through explicitly
        if coordinator_address is None:
            coordinator_address = env
        if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
            num_processes = int(os.environ["JAX_NUM_PROCESSES"])
        if process_id is None and "JAX_PROCESS_ID" in os.environ:
            process_id = int(os.environ["JAX_PROCESS_ID"])
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
                local_device_ids=local_device_ids)
        except RuntimeError as e:
            # the one unrecoverable ordering mistake: some earlier call
            # (jax.devices(), a logger asking for process_index, ...)
            # already initialized the backend single-process
            raise RuntimeError(
                "jax.distributed.initialize failed — the jax backend "
                "was touched before init_distributed(); call it first "
                "thing in the entrypoint (tools/train.py does)") from e
        _initialized = True
    return jax.process_index(), jax.process_count()


_initialized = False


def is_main_process() -> bool:
    return jax.process_index() == 0


def local_batch_to_global(batch, mesh, axis_name: str = "data"):
    """Assemble per-process local numpy batches into global arrays
    sharded over ``mesh``.

    Each process holds [B_local, ...]; the result behaves as the
    concatenated [B_local * P, ...] array with the leading axis
    sharded over ``axis_name`` — feed it straight to the pjit train
    step.  Single-process meshes fall back to a plain device_put.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    if jax.process_count() == 1:
        from .mesh import shard_batch
        return shard_batch(batch, mesh, axis_name)

    def put(x):
        x = np.asarray(x)
        spec = P(axis_name) if x.ndim >= 1 else P()
        global_shape = ((x.shape[0] * jax.process_count(),) + x.shape[1:]
                        if x.ndim >= 1 else x.shape)
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x, global_shape)
    return jax.tree.map(put, batch)


def gather_results(results: list, num_shards: int, shard_id: int,
                   total: int, allgather=None, example=None):
    """All-gather per-image result dicts across processes and restore
    dataset order.

    Each process evaluated images ``shard_id::num_shards`` of the
    dataset; results are dicts of FIXED-SHAPE numpy arrays (the padded
    detection layout), so the gather is a dense all-gather instead of
    the reference's pickle-shard dance (apis/test.py:74-146).

    Args:
      results: this process's list of per-image dicts.
      total: dataset length.
      allgather: array → [num_shards, ...] stacked across processes;
        defaults to ``multihost_utils.process_allgather`` (the real
        path is exercised by a 2-process Gloo CPU cluster in
        tests/test_dist.py::test_gather_results_two_process_gloo;
        injectable for in-process tests).
      example: template dict (key → array) giving the per-image result
        spec. Required when this process's shard may be EMPTY
        (num_shards > dataset length): the collective's key set and
        array shapes must match across processes, so an empty shard
        contributes zero-padded arrays built from the template.
    Returns the full ordered list on every process.
    """
    if num_shards == 1:
        return results
    if allgather is None:
        from jax.experimental import multihost_utils
        allgather = multihost_utils.process_allgather

    template = results[0] if results else example
    if template is None:
        raise ValueError(
            "gather_results: local shard is empty and no `example` "
            "template was given; every process must contribute "
            "identically-shaped arrays to the all-gather")
    keys = sorted(template.keys())
    n_max = -(-total // num_shards)
    stacked = {}
    for k in keys:
        if results:
            arr = np.stack([np.asarray(r[k]) for r in results])
        else:
            arr = np.zeros((0,) + np.asarray(template[k]).shape,
                           np.asarray(template[k]).dtype)
        if arr.shape[0] < n_max:  # pad the short shards
            pad = np.zeros((n_max - arr.shape[0],) + arr.shape[1:],
                           arr.dtype)
            arr = np.concatenate([arr, pad])
        stacked[k] = allgather(arr)                   # [P, n_max, ...]

    ordered = [None] * total
    for s in range(num_shards):
        idxs = list(range(s, total, num_shards))
        for j, i in enumerate(idxs):
            ordered[i] = {k: stacked[k][s, j] for k in keys}
    return ordered
