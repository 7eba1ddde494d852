"""Worker for the real 2-process gather_results test.

Spawned by tests/test_dist.py::test_gather_results_two_process_gloo.
Each process joins a jax.distributed CPU cluster (Gloo collectives)
through aidet_tpu.parallel.init_distributed and runs the REAL
``multihost_utils.process_allgather`` path of gather_results — no
injected allgather.
"""

import os
import sys


def main():
    coord, pid = sys.argv[1], int(sys.argv[2])
    # The site hook may prepend the axon TPU platform; this worker must
    # stay on CPU (two processes cannot share the one-chip tunnel).
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from aidet_tpu.parallel import gather_results, init_distributed

    rank, count = init_distributed(coordinator_address=coord,
                                   num_processes=2, process_id=pid)
    assert (rank, count) == (pid, 2), (rank, count)

    import numpy as np

    def make(i):
        return dict(boxes=np.full((3, 4), float(i), np.float32),
                    scores=np.full((3,), float(i), np.float32))

    # dataset of 5 → shards [0,2,4] and [1,3]; odd total exercises the
    # short-shard padding inside the collective
    total = 5
    results = [make(i) for i in range(pid, total, count)]
    ordered = gather_results(results, count, pid, total)
    assert len(ordered) == total
    for i, r in enumerate(ordered):
        assert float(r["scores"][0]) == float(i), (pid, i, r)
        assert float(r["boxes"][0, 0]) == float(i), (pid, i, r)

    # empty-shard path over the real collective: total=1, shard 1 empty
    example = dict(boxes=np.zeros((3, 4), np.float32),
                   scores=np.zeros((3,), np.float32))
    local = [make(0)] if pid == 0 else []
    ordered1 = gather_results(local, count, pid, 1, example=example)
    assert len(ordered1) == 1
    assert float(ordered1[0]["scores"][0]) == 0.0

    print(f"worker {pid} OK", flush=True)


if __name__ == "__main__":
    main()
