"""Pipeline parallelism (pp): GPipe-style microbatch pipeline on a mesh axis.

The reference runs every model on one GPU (base_infer_task.py:69 hard-codes
cuda:0), so it has no pipeline story at all. On TPU pods, pipeline
parallelism is the standard way to spread a *depth-wise* repeated stack
(LORE's ``stacking_layers`` transformer regressors, DLA stages) over
devices when tensor sharding stops paying: each device holds one stage's
params, microbatches stream through, and activations hop one ICI step per
tick via ``lax.ppermute`` (the scaling-book recipe — bubble fraction
(L-1)/(M+L-1), ICI traffic one activation per tick per device).

Design notes (TPU-first):
* one ``lax.scan`` over M+L-1 ticks — static trip count, compiles once;
* ``ppermute`` ring handoff — XLA schedules the collective on ICI and
  overlaps it with the next tick's compute;
* stage params live as a leading-axis stack sharded over ``pp`` via
  shard_map, so each device touches only its own slice (no all-gather);
* fully differentiable: the VJP of ppermute is the reverse ring, so
  ``jax.grad`` through the pipeline gives exact data-parallel-equivalent
  gradients (tested in tests/test_parallel_pp.py).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


def _pp_body(stage_fn: Callable, axis_name: str, my_params, microbatches):
    """Per-device body (inside shard_map): run the microbatch pipeline.

    my_params: this device's stage params (leading stage axis stripped by
               the shard_map spec, i.e. a (1, ...) slice) — squeezed here.
    microbatches: (M, mb, ...) — replicated input stream; stage 0 ingests
               microbatch t at tick t, stage L-1 emits at tick t+L-1.
    Returns (M, mb, ...) outputs, valid on every device (psum-broadcast).
    """
    params = jax.tree.map(lambda a: a[0], my_params)
    idx = lax.axis_index(axis_name)
    M = microbatches.shape[0]
    # mesh axis sizes are static, so psum(1) folds to a Python int here
    L = int(lax.psum(1, axis_name))
    perm = [(i, (i + 1) % L) for i in range(L)]

    outputs0 = jnp.zeros((M,) + microbatches.shape[1:],
                         microbatches.dtype)
    buf0 = jnp.zeros(microbatches.shape[1:], microbatches.dtype)
    # the scan carry becomes device-varying after the first ppermute; new
    # jax (check_vma) requires the INITIAL carry to carry that annotation
    if hasattr(lax, "pcast"):
        outputs0 = lax.pcast(outputs0, (axis_name,), to="varying")
        buf0 = lax.pcast(buf0, (axis_name,), to="varying")
    elif hasattr(lax, "pvary"):  # older spelling
        outputs0 = lax.pvary(outputs0, (axis_name,))
        buf0 = lax.pvary(buf0, (axis_name,))

    def tick(carry, t):
        buf, outputs = carry
        # stage 0 ingests microbatch t while it exists; later ticks feed it
        # zeros (their results never reach a valid output slot)
        t_in = jnp.clip(t, 0, M - 1)
        fresh = lax.dynamic_index_in_dim(microbatches, t_in, 0,
                                         keepdims=False)
        x = jnp.where(idx == 0,
                      jnp.where(t < M, fresh, jnp.zeros_like(fresh)), buf)
        y = stage_fn(params, x)
        # the last stage finished microbatch t-(L-1) this tick
        t_out = t - (L - 1)
        t_oc = jnp.clip(t_out, 0, M - 1)
        cur = lax.dynamic_index_in_dim(outputs, t_oc, 0, keepdims=False)
        val = jnp.where((idx == L - 1) & (t_out >= 0), y, cur)
        outputs = lax.dynamic_update_index_in_dim(outputs, val, t_oc, 0)
        buf = lax.ppermute(y, axis_name, perm)
        return (buf, outputs), None

    (_, outputs), _ = lax.scan(tick, (buf0, outputs0),
                               jnp.arange(M + L - 1))
    # broadcast the last stage's outputs to every pp rank (cheap at demo
    # sizes; production consumers would keep them on the last stage)
    return lax.psum(jnp.where(idx == L - 1, outputs,
                              jnp.zeros_like(outputs)), axis_name)


def gpipe_apply(stage_fn: Callable, stacked_params, microbatches,
                mesh: Mesh, axis_name: str = "pp"):
    """Run ``y = stage_{L-1}(... stage_0(x))`` for every microbatch, with
    the L stages spread over the mesh's ``axis_name`` axis.

    stage_fn: (params, x) -> y, with y.shape == x.shape (uniform stack —
        exactly LORE's stacked regressor / repeated transformer shape).
    stacked_params: pytree whose leaves have leading dim L == mesh axis
        size (one stage slice per device).
    microbatches: (M, mb, ...) input stream.
    Returns (M, mb, ...) outputs (replicated).
    """
    pspec_params = jax.tree.map(lambda _: P(axis_name), stacked_params)
    kwargs = dict(mesh=mesh, in_specs=(pspec_params, P()), out_specs=P())
    try:
        from jax import shard_map
    except ImportError:  # pre-0.8 jax
        from jax.experimental.shard_map import shard_map
        kwargs["check_rep"] = False
    fn = shard_map(partial(_pp_body, stage_fn, axis_name), **kwargs)
    return fn(stacked_params, microbatches)


def sequential_apply(stage_fn: Callable, stacked_params, microbatches):
    """Reference semantics of :func:`gpipe_apply` on one device."""
    L = jax.tree.leaves(stacked_params)[0].shape[0]

    def run_one(x):
        for i in range(L):
            params = jax.tree.map(lambda a: a[i], stacked_params)
            x = stage_fn(params, x)
        return x

    return jax.vmap(run_one)(microbatches)
