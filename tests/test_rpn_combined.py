"""Combined RPN cls+reg 1x1 conv (single HBM pass over the tower
output) must be bitwise-equivalent to the split-conv reference path
with the identical parameter tree (parity execution detail of
mmdet/models/anchor_heads/rpn_head.py:13-38)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from aidet_tpu.models.heads.rpn_head import RPNHead


def _run(combined):
    old = os.environ.get("AIDET_RPN_COMBINED")
    os.environ["AIDET_RPN_COMBINED"] = "1" if combined else "0"
    try:
        head = RPNHead(in_channels=32, feat_channels=32, num_anchors=3)
        feats = [jnp.asarray(np.random.RandomState(i).randn(
            2, 16 // (2 ** i), 16 // (2 ** i), 32), jnp.float32)
            for i in range(3)]
        v = head.init(jax.random.PRNGKey(0), feats)
        cls_out, reg_out = head.apply(v, feats)
        return v, cls_out, reg_out
    finally:
        if old is None:
            os.environ.pop("AIDET_RPN_COMBINED", None)
        else:
            os.environ["AIDET_RPN_COMBINED"] = old


def test_combined_matches_split():
    v1, c1, r1 = _run(combined=True)
    v0, c0, r0 = _run(combined=False)
    # identical checkpoint tree (same names, same shapes)
    flat1 = jax.tree_util.tree_leaves_with_path(v1)
    flat0 = jax.tree_util.tree_leaves_with_path(v0)
    assert [p for p, _ in flat1] == [p for p, _ in flat0]
    assert [x.shape for _, x in flat1] == [x.shape for _, x in flat0]
    # same params (same PRNG + same tree) -> same outputs
    for a, b in zip(c1, c0):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-5)
    for a, b in zip(r1, r0):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-5)
