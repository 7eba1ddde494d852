"""Training state + pjit data-parallel train step.

TPU-native replacement for the reference's runner glue
(mmdet/apis/train.py:35-165): parse_losses → one scalar; optimizer =
SGD(momentum) + weight decay + grad clip (configs/dota/*:195-203);
the per-variable all-reduce of log values (apis/train.py:46-54) is
free under SPMD — metrics come out of the jitted step already reduced.
"""

from __future__ import annotations

from typing import Any, Callable

import flax
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def build_lr_schedule(base_lr: float = 0.02,
                      warmup_iters: int = 500,
                      warmup_ratio: float = 1.0 / 3.0,
                      decay_steps=(8, 11),
                      iters_per_epoch: int = 1000,
                      gamma: float = 0.1):
    """Linear warmup + step decay (mmcv LrUpdaterHook semantics as
    configured by lr_config in the reference configs)."""
    boundaries = {int(e * iters_per_epoch): gamma for e in decay_steps}

    def schedule(step):
        lr = base_lr
        if warmup_iters > 0:
            alpha = jnp.minimum(step / warmup_iters, 1.0)
            lr = lr * (warmup_ratio + (1 - warmup_ratio) * alpha)
        for b, g in boundaries.items():
            lr = jnp.where(step >= b, lr * g, lr)
        return lr
    return schedule


def _param_kinds(params):
    """Classify each param as 'norm' (affine of a norm layer: has a
    'scale' sibling), 'bias' (conv/dense bias: has a 'kernel' sibling),
    or 'weight'."""
    flat = flax.traverse_util.flatten_dict(params)

    def kind(path):
        name = path[-1]
        if name in ("scale", "bias") and path[:-1] + ("scale",) in flat:
            return "norm"
        if name == "bias":
            return "bias"
        if name.endswith("_scale") or name.endswith("_bias"):
            return "norm"      # per-level SepBN affine pairs
        return "weight"

    return flax.traverse_util.unflatten_dict(
        {p: kind(p) for p in flat})


def build_optimizer(lr_schedule, momentum: float = 0.9,
                    weight_decay: float = 1e-4,
                    grad_clip_norm: float | None = 35.0,
                    paramwise_options: dict | None = None):
    """SGD + momentum + decoupled wd + global-norm clip.

    Parity: optimizer config (configs/dota/*: SGD lr=0.02 momentum=0.9
    weight_decay=1e-4) + grad_clip dict(max_norm=35, norm_type=2)
    handled by OptimizerHook.

    paramwise_options (core/optimizer/builder.py:10-98): dict with
    ``bias_lr_mult`` / ``bias_decay_mult`` (conv/fc biases, NOT norm
    affines) and ``norm_decay_mult`` (norm scale+bias) — each group's
    lr / weight decay is scaled by its multiplier.
    """
    pw = paramwise_options or {}
    bias_lr_mult = pw.get("bias_lr_mult", 1.0)
    bias_decay_mult = pw.get("bias_decay_mult", 1.0)
    norm_decay_mult = pw.get("norm_decay_mult", 1.0)

    tx = []
    if grad_clip_norm is not None:
        tx.append(optax.clip_by_global_norm(grad_clip_norm))
    if weight_decay:
        if pw:
            def wd_mask(kind_target):
                return lambda params: jax.tree.map(
                    lambda k: k == kind_target, _param_kinds(params))
            mults = dict(weight=1.0, bias=bias_decay_mult,
                         norm=norm_decay_mult)
            for kind_name, mult in mults.items():
                if mult:
                    tx.append(optax.masked(
                        optax.add_decayed_weights(weight_decay * mult),
                        wd_mask(kind_name)))
        else:
            tx.append(optax.add_decayed_weights(weight_decay))
    tx.append(optax.sgd(lr_schedule, momentum=momentum))
    if pw and bias_lr_mult != 1.0:
        # scaling the post-sgd update by the multiplier == scaling lr
        tx.append(optax.masked(
            optax.scale(bias_lr_mult),
            lambda params: jax.tree.map(lambda k: k == "bias",
                                        _param_kinds(params))))
    return optax.chain(*tx)


def create_train_state(model, optimizer, sample_imgs, rng) -> TrainState:
    variables = model.init(rng, sample_imgs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats,
                      opt_state=optimizer.init(params))


def make_train_step(model, optimizer,
                    mesh=None, axis_name: str = "data",
                    donate: bool = True) -> Callable:
    """Build the jitted data-parallel train step.

    state is replicated, batch sharded on its leading dim over
    ``axis_name``; XLA inserts the gradient all-reduce (the SPMD
    equivalent of DDP/allreduce_grads, core/utils/dist_utils.py:31-60).
    """

    def step_fn(state: TrainState, batch: dict, rng) -> tuple:
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            losses = model.apply(variables, method="loss",
                                 rngs={"sampling": rng}, **batch)
            total = sum(jax.tree.leaves(losses))
            return total, losses

        (total, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        metrics = dict(losses)
        metrics["loss"] = total
        # pre-clip global gradient norm: outlier-batch observability
        # (a spike here flags the batch that destabilised training)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis_name))
    return jax.jit(
        step_fn,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else ())


def make_eval_step(model, mesh=None, axis_name: str = "data") -> Callable:
    def eval_fn(state: TrainState, imgs, img_shapes, scale_factors=None):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        return model.apply(variables, imgs, img_shapes, scale_factors,
                           method="predict")

    if mesh is None:
        return jax.jit(eval_fn)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis_name))
    jitted = jax.jit(eval_fn, in_shardings=(repl, data, data, data),
                     out_shardings=repl)

    def call(state, imgs, img_shapes, scale_factors=None):
        # the sharded program always takes 4 args; materialize the
        # optional scale_factors so the 3-arg call of the unsharded
        # path works here too
        if scale_factors is None:
            import jax.numpy as jnp
            scale_factors = jnp.ones(imgs.shape[0], jnp.float32)
        return jitted(state, imgs, img_shapes, scale_factors)

    return call
