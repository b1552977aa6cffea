"""Sharded train step builder (optax + jit over a Mesh).

The reference trains with a stock single-GPU HF Trainer
(trainer/basic_trainer.py:26). TPU-native design: explicit device mesh with
``dp`` (batch) and ``tp`` (width) axes; the batch shards over dp, large
kernel output-channel dims shard over tp, everything else replicates; XLA
inserts the gradient psums over ICI.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, variables, tx):
        params = variables.get("params", variables)
        batch_stats = variables.get("batch_stats", {})
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params))


def _tp_spec_for_param(path: Tuple, value: jax.Array,
                       min_shard_dim: int = 256, tp_size: int = 1):
    """Kernel sharding rule: shard the output-channel (last) dim of large
    kernels over tp; replicate the rest. Keeps small convs replicated to
    avoid collective overhead dominating."""
    if value.ndim >= 2 and value.shape[-1] >= min_shard_dim \
            and value.shape[-1] % tp_size == 0:
        return P(*([None] * (value.ndim - 1) + ["tp"]))
    return P()


def make_param_shardings(mesh: Mesh, params,
                         min_shard_dim: int = 256):
    tp = mesh.shape.get("tp", 1)

    def to_sharding(path, v):
        return NamedSharding(mesh, _tp_spec_for_param(path, v,
                                                      min_shard_dim, tp))

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def make_train_step(apply_fn: Callable, loss_fn: Callable, tx,
                    mesh: Optional[Mesh] = None,
                    donate: bool = True,
                    accum_steps: int = 1) -> Callable:
    """Returns jitted ``step(state, batch) -> (state, metrics)``.

    apply_fn(variables, batch, train=True) -> (outputs, new_batch_stats)
    loss_fn(outputs, batch) -> {'loss': scalar, ...}
    With a mesh: batch dim 0 shards over 'dp', params/opt state follow
    make_param_shardings.
    ``accum_steps > 1``: the leading batch dim splits into that many
    microbatches run under ONE lax.scan (one compiled forward/backward,
    peak activation memory of a single microbatch), gradients average,
    the optimizer updates once — effective batch B with the HBM of B/k.
    """

    def grads_of(params, batch_stats, batch):
        def compute(p):
            variables = {"params": p}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            outputs, new_stats = apply_fn(variables, batch)
            losses = loss_fn(outputs, batch)
            return losses["loss"], (losses, new_stats)

        (_, (losses, new_stats)), grads = jax.value_and_grad(
            compute, has_aux=True)(params)
        return grads, losses, new_stats

    def step(state: TrainState, batch: Dict[str, jax.Array]):
        if accum_steps > 1:
            micro = jax.tree.map(
                lambda x: x.reshape((accum_steps, -1) + x.shape[1:]),
                batch)

            def body(carry, mb):
                g_acc, l_acc, _stats = carry
                grads, losses, new_stats = grads_of(state.params,
                                                    state.batch_stats, mb)
                g_acc = jax.tree.map(jnp.add, g_acc, grads)
                l_acc = jax.tree.map(jnp.add, l_acc, losses)
                return (g_acc, l_acc, new_stats), None

            g0 = jax.tree.map(jnp.zeros_like, state.params)
            mb0 = jax.tree.map(lambda x: x[0], micro)
            _, l_shape, s_shape = jax.eval_shape(
                grads_of, state.params, state.batch_stats, mb0)
            zeros = lambda t: jax.tree.map(  # noqa: E731
                lambda sd: jnp.zeros(sd.shape, sd.dtype), t)
            (grads, losses, new_stats), _ = jax.lax.scan(
                body, (g0, zeros(l_shape), zeros(s_shape)), micro)
            grads = jax.tree.map(lambda g: g / accum_steps, grads)
            losses = jax.tree.map(lambda v: v / accum_steps, losses)
        else:
            grads, losses, new_stats = grads_of(state.params,
                                                state.batch_stats, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats, opt_state=new_opt)
        metrics = {k: v for k, v in losses.items()}
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    batch_sharding = NamedSharding(mesh, P("dp"))
    sp = mesh.shape.get("sp", 1)
    spatial_sharding = NamedSharding(mesh, P("dp", "sp")) if sp > 1 else None

    def sharded_step(state, batch):
        def spec_for(v):
            # spatial partitioning: image-like tensors (B, H, W, C) also
            # shard H over 'sp' — XLA GSPMD inserts the conv halo
            # exchanges, so pages larger than one chip's HBM still train
            # (the reference has no multi-device story at all)
            if spatial_sharding is not None and getattr(v, "ndim", 0) >= 4 \
                    and v.shape[1] % sp == 0:
                return spatial_sharding
            return batch_sharding

        batch = jax.lax.with_sharding_constraint(
            batch, jax.tree.map(spec_for, batch))
        return step(state, batch)

    return jax.jit(sharded_step, donate_argnums=(0,) if donate else ())


def shard_state(state: TrainState, mesh: Mesh,
                min_shard_dim: int = 256) -> TrainState:
    """Place a TrainState onto the mesh: params/opt by the tp rule,
    scalars replicated."""
    param_sh = make_param_shardings(mesh, state.params, min_shard_dim)
    repl = NamedSharding(mesh, P())

    def place(tree, shardings):
        return jax.tree.map(jax.device_put, tree, shardings)

    opt_sh = jax.tree.map(
        lambda v: param_sh if isinstance(v, type(state.params)) else repl,
        state.opt_state,
        is_leaf=lambda v: isinstance(v, type(state.params)))

    return state.replace(
        step=jax.device_put(state.step, repl),
        params=place(state.params, param_sh),
        batch_stats=jax.tree.map(lambda v: jax.device_put(v, repl),
                                 state.batch_stats),
        opt_state=jax.tree.map(lambda v: jax.device_put(v, repl),
                               state.opt_state),
    )
