"""Device mesh + sharding helpers (data parallelism over ICI).

Idiomatic jit-based SPMD: build a ``Mesh``, give the batch a
``NamedSharding(P("data", ...))``, replicate params, and let XLA insert
the gradient all-reduce over ICI. ``shard_map`` is not needed for pure
DP — jit's sharding propagation already emits the psum.

Clouds are small (``[B, N<=4096, 3]``) so DP is the strategy that pays at
this model scale (SURVEY.md §2.6); the axis name is threaded everywhere
so multi-host DCN or extra axes (model/expert) slot in later.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    n_devices: Optional[int] = None,
    axis: str = DATA_AXIS,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


@functools.lru_cache(maxsize=1)
def get_mesh() -> Mesh:
    """Process-wide default mesh over all local devices."""
    return make_mesh()


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis: str = DATA_AXIS) -> Any:
    """Device-put a host batch with its leading axis split over the mesh.

    Every leaf's dim 0 must be divisible by the mesh size — static shapes,
    so pad the final partial batch on the host (the data layer does).
    """
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (params / train state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def shard_map_train_step(step_fn, mesh: Mesh, axis: str = DATA_AXIS):
    """shard_map variant of the DP train step — required when the step
    contains Pallas kernels (jit-SPMD has no partitioner for custom
    calls and would replicate them on real multi-chip).

    ``step_fn(state, batch, rng) -> (state, metrics)`` runs per shard;
    it must compute a LOCAL-mean loss and pmean its own grads/metrics
    over ``axis`` (make_cls_train_step does when built with
    ``axis_name``), and the model must be constructed with the same
    ``axis_name``/``world`` so every BatchNorm syncs.
    """
    from jax import shard_map

    def per_shard(state, batch, rng):
        # fold the shard index in: a replicated rng would give every
        # shard the SAME dropout mask for its local rows (W-fold
        # correlated dropout vs jit-SPMD's single global mask)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        return step_fn(state, batch, rng)

    repl, data = P(), P(axis)
    return jax.jit(
        shard_map(
            per_shard, mesh=mesh,
            in_specs=(repl, data, repl),
            out_specs=(repl, repl),
            check_vma=False,  # pallas outputs carry no vma metadata
        ),
        donate_argnums=(0,),
    )


def shard_map_eval_step(step_fn, mesh: Mesh, axis: str = DATA_AXIS,
                        out_specs=None):
    """shard_map an eval step ``(state, batch) -> out`` — the eval-side
    companion of :func:`shard_map_train_step`, required for the same
    reason (jit-SPMD cannot partition Pallas custom calls on a real
    multi-chip mesh). ``state`` is replicated, the batch split over
    ``axis``. ``out_specs`` defaults to replicated — the step must then
    psum its own reductions over ``axis``; pass ``P(axis)`` (or a tree)
    for per-sample outputs like seg predictions.
    """
    from jax import shard_map

    repl, data = P(), P(axis)
    if out_specs is None:
        out_specs = repl
    return jax.jit(
        shard_map(
            step_fn, mesh=mesh,
            in_specs=(repl, data),
            out_specs=out_specs,
            check_vma=False,  # pallas outputs carry no vma metadata
        )
    )


def shard_train_step(step_fn, mesh: Mesh, axis: str = DATA_AXIS):
    """jit a ``(state, batch, rng) -> (state, metrics)`` step for DP.

    State/rng replicated, batch sharded on dim 0, state donated. XLA
    turns the replicated-output gradient into a psum over ``axis`` on ICI.
    """
    repl = replicated(mesh)
    data = batch_sharding(mesh, axis)
    return jax.jit(
        step_fn,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
