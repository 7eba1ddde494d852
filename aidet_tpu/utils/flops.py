"""Model complexity info via XLA cost analysis.

Replaces the reference's hook-based FLOPs counter
(mmdet/utils/flops_counter.py + tools/get_flops.py): the compiled
computation itself reports exact FLOPs/bytes through
``jit(...).lower().compile().cost_analysis()``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_model_complexity_info(model, input_shape, method=None):
    """Returns (flops, params, bytes_accessed) for one forward pass.

    Args:
      model: flax module; input_shape: e.g. (1, 1024, 1024, 3).
    """
    x = jnp.zeros(input_shape, jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    params = sum(p.size for p in jax.tree.leaves(variables["params"]))

    if method is None:
        fn = lambda v, x: model.apply(v, x)
    else:
        fn = lambda v, x: model.apply(v, x, method=method)
    compiled = jax.jit(fn).lower(variables, x).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns a list per device
        cost = cost[0]
    flops = float(cost.get("flops", -1.0))
    bytes_accessed = float(cost.get("bytes accessed", -1.0))
    return flops, params, bytes_accessed


def params_to_string(n):
    return f"{n / 1e6:.2f}M"


def flops_to_string(n):
    if n >= 1e12:
        return f"{n / 1e12:.2f} TFLOPs"
    return f"{n / 1e9:.2f} GFLOPs"
