"""Async-inference throughput benchmark (parity: reference
tests/async_benchmark.py, referenced from docs/GETTING_STARTED.md:133
— concurrent-streams throughput vs synchronous single-stream).

On TPU the dispatch is natively asynchronous; this measures how much
keeping N batches in flight (AsyncInferencer depth) hides host-side
pipeline latency vs draining every call synchronously.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?",
                   default="configs/dota_theta_obb_r18_e2e.py")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--n-images", type=int, default=32)
    p.add_argument("--depths", type=int, nargs="*", default=[1, 2, 4])
    p.add_argument("--platform", default=os.environ.get("AIDET_PLATFORM"),
                   choices=["cpu", "tpu", "axon"])
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from aidet_tpu.apis.async_inference import AsyncInferencer
    from aidet_tpu.apis.inference import init_detector

    model, variables, _cfg = init_detector(args.config, args.checkpoint)
    size = getattr(model, "img_size", 1024)
    rs = np.random.RandomState(0)
    imgs = [
        (rs.rand(size, size, 3) * 255).astype(np.uint8)
        for _ in range(4)]

    for depth in args.depths:
        inf = AsyncInferencer(model, variables, depth=depth)
        # warm (compile)
        inf.submit(imgs[0])
        inf.drain_all()
        t0 = time.perf_counter()
        for i in range(args.n_images):
            inf.submit(imgs[i % len(imgs)], tag=i)
        inf.drain_all()
        dt = time.perf_counter() - t0
        print(f"depth={depth}: {args.n_images / dt:7.2f} img/s "
              f"({dt / args.n_images * 1e3:.1f} ms/img)", flush=True)


if __name__ == "__main__":
    main()
