"""Multi-host (DCN) initialization — the v1 stub promised in SURVEY §2.6.

Single-host ICI data parallelism is fully supported (mesh.py). For
multi-host slices the same 1-D ``data`` axis simply spans all global
devices; this module wires up ``jax.distributed`` from the standard
environment (JAX_COORDINATOR_ADDRESS / TPU pod env) and hands back a
global mesh. Per-host data loading feeds ``jax.make_array_from_process_
local_data`` so each host only touches its shard.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pointcloudlib_tpu.parallel.mesh import DATA_AXIS


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running under a multi-host
    launcher. Returns True when a multi-process runtime is active.

    No-op on a single host (the common case in this repo).

    Order matters: ``jax.process_count()`` initializes the XLA backend,
    after which ``jax.distributed.initialize`` refuses to run — so the
    already-initialized probe must NOT touch the backend (caught by
    tests/test_multihost.py, which runs a real 2-process cluster)."""
    try:
        from jax._src import distributed as _dist

        already = _dist.global_state.client is not None
    except Exception:  # private-API drift: fall back to the env probe
        already = False
    if already:
        return jax.process_count() > 1
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is None:
        # pod runtimes (TPU_WORKER_HOSTNAMES etc.) auto-initialize on
        # first backend touch; anything else is single-process
        return jax.process_count() > 1
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def global_mesh(axis: str = DATA_AXIS) -> Mesh:
    """1-D data mesh over ALL global devices (every host's chips)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def host_local_batch_to_global(mesh: Mesh, batch, axis: str = DATA_AXIS):
    """Assemble a globally-sharded batch from per-host shards.

    Each process passes its local slice of the batch; the returned
    arrays are global jax.Arrays sharded over ``axis``.
    """
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        batch,
    )
