"""Parallelism over the TPU device mesh.

The reference is single-GPU (SURVEY.md §2.6 — no DP/TP/PP/SP/EP of any
kind). Here data parallelism over ICI is first-class: a 1-D ``data`` mesh,
batch sharded, params replicated, XLA inserting the gradient psum.
"""

from pointcloudlib_tpu.parallel.multihost import (
    global_mesh,
    host_local_batch_to_global,
    initialize_multihost,
)
from pointcloudlib_tpu.parallel.mesh import (
    get_mesh,
    make_mesh,
    replicate,
    shard_batch,
    shard_train_step,
)

__all__ = [
    "get_mesh",
    "global_mesh",
    "host_local_batch_to_global",
    "initialize_multihost",
    "make_mesh",
    "replicate",
    "shard_batch",
    "shard_train_step",
]
