"""Shared timing helper for the bench/profile CLIs."""

from __future__ import annotations

import time


def timeit(fn, *args, iters=10):
    """Mean wall time of a jitted fn over ``iters`` chained calls.

    block_until_ready does NOT reliably synchronize through remote
    device tunnels (axon) — so the iterations chain through a device
    accumulator and only the final float() pays one host round-trip
    (the same scheme as bench.py)."""
    import jax
    import jax.numpy as jnp

    def red(out):
        leaves = [l for l in jax.tree_util.tree_leaves(out)
                  if hasattr(l, "dtype")]
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    f2 = jax.jit(lambda acc, *a: acc + red(fn(*a)))
    acc = f2(jnp.float32(0), *args)
    float(acc)                                  # compile + warm
    acc = jnp.float32(0)
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = f2(acc, *args)
    float(acc)                                  # one sync for the chain
    return (time.perf_counter() - t0) / iters
