"""pointcloudlib_tpu — a TPU-native point-cloud deep-learning framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of Jittor's
PointCloudLib (reference at /root/reference): six model families
(PointNet, PointNet++ SSG/MSG, PointCNN, DGCNN, PointConv, KPConv) for
ModelNet40 classification and ShapeNet part segmentation.

Design stance (TPU-first, not a port):
  * channel-last ``[B, N, C]`` layouts everywhere — feature axis maps to
    TPU lanes, matmuls hit the MXU;
  * static shapes + padded fixed-width neighbor index lists with explicit
    boolean validity masks (one convention, replacing the reference's three
    ad-hoc padding schemes);
  * a functional core: pure jnp ops, flax.linen modules, one jit-ed train
    step, optax optimizers, orbax checkpoints;
  * data parallelism via ``jax.sharding.Mesh`` + NamedSharding over ICI
    (the reference is single-GPU; see SURVEY.md §2.6);
  * Pallas kernels for the sequential/hot neighbor ops (FPS), XLA-native
    fused compositions where the compiler already wins (kNN, ball query).
"""

__version__ = "0.1.0"

from pointcloudlib_tpu import ops  # noqa: F401
