"""Sharded train-step tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np

from __graft_entry__ import dryrun_multichip, entry


def test_dryrun_multichip_8():
    assert len(jax.devices()) >= 8
    dryrun_multichip(8)


def test_train_step_updates_params_and_decreases_loss():
    import jax.numpy as jnp

    from __graft_entry__ import _build_flagship
    from aidet_tpu.parallel import (build_lr_schedule, build_optimizer,
                                    create_mesh, create_train_state,
                                    make_train_step, replicate, shard_batch)

    img, max_gt, b = 128, 8, 2
    model = _build_flagship(img, small=True)
    mesh = create_mesh(2)
    opt = build_optimizer(build_lr_schedule(0.02, warmup_iters=5))
    state = create_train_state(model, opt, jnp.zeros((1, img, img, 3)),
                               jax.random.PRNGKey(0))
    state = replicate(state, mesh)

    rs = np.random.RandomState(0)
    xy = rs.uniform(10, img - 50, (b, max_gt, 2))
    wh = rs.uniform(10, 40, (b, max_gt, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    rboxes = np.concatenate([xy + wh / 2, wh,
                             rs.uniform(-1.5, -0.1, (b, max_gt, 1))],
                            -1).astype(np.float32)
    batch = shard_batch(dict(
        imgs=rs.randn(b, img, img, 3).astype(np.float32),
        gt_boxes=boxes, gt_valid=np.ones((b, max_gt), bool),
        gt_labels=rs.randint(1, 16, (b, max_gt)).astype(np.int32),
        gt_rboxes=rboxes,
        img_shapes=np.tile([[img, img]], (b, 1)).astype(np.float32)), mesh)

    step = make_train_step(model, opt, mesh=mesh)
    # frozen_stages=1 zeroes gradients for the stem/stage-1 leaves
    # (reference parity), so look at the GLOBAL parameter movement
    p0 = np.concatenate([np.ravel(jax.device_get(x))
                         for x in jax.tree.leaves(state.params)])
    losses = []
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(42))
        losses.append(float(metrics["loss"]))
    p1 = np.concatenate([np.ravel(jax.device_get(x))
                         for x in jax.tree.leaves(state.params)])
    assert not np.allclose(p0, p1), "params did not update"
    assert int(state.step) == 3
    assert all(np.isfinite(l) for l in losses)
    # same batch thrice: the loss should go down
    assert losses[-1] < losses[0]
