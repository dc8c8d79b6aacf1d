"""Farthest-point sampling as a Pallas TPU kernel.

The reference implements FPS as a CUDA block-per-cloud kernel with a
shared-memory argmax tree reduction (misc/ops.py:114-286). The XLA
``lax.scan`` port (ops.geometry.farthest_point_sample) is correct but
slow: each of the m iterations is a separate HBM round-trip over the
distance cache, and scan overhead dominates (~35 ms for a [16,1024]→512
sample on v5e).

This kernel keeps everything VMEM-resident and vectorizes across the
batch: one grid step processes a [Bt, N] tile of clouds, advancing every
cloud's FPS state one selection per ``fori_loop`` iteration on the VPU.
The selected point's coordinates are extracted with a masked reduction
(lane == argmax index) instead of a cross-lane gather, which the VPU
does in a single pass.

Numerics match the scan/CUDA reference exactly: seed index 0, running
min-distance cache, argmax with lowest-index tie-break, optional
``|p|^2 <= 1e-3`` skip (reference misc/ops.py:162-163).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from pointcloudlib_tpu.ops.pallas.prec import pin_default_matmul_precision
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_VMEM_BUDGET = 8 * 1024 * 1024  # leave headroom below the ~16MB/core


@pin_default_matmul_precision
def _fps_kernel(x_ref, y_ref, z_ref, elig_ref, out_ref, mind_ref):
    """One [Bt, N] tile: full FPS for every cloud in the tile.

    Refs: x/y/z/elig [Bt, N] f32 (elig is a 0/1 mask), out [Bt, M] i32,
    mind [Bt, N] f32 scratch (running min squared distance).
    """
    bt, n = x_ref.shape
    m = out_ref.shape[1]
    x, y, z = x_ref[:], y_ref[:], z_ref[:]
    elig = elig_ref[:] > 0.0
    lane = lax.broadcasted_iota(jnp.int32, (bt, n), 1)
    col = lax.broadcasted_iota(jnp.int32, (bt, m), 1)

    # ineligible points are pinned at -1 so they never win the argmax
    # (reference `continue` + besti=0 default, misc/ops.py:162-171)
    mind_ref[:] = jnp.where(elig, 1e10, -1.0)

    def body(j, carry):
        # Mosaic can't store to a dynamic single lane, so the index
        # matrix rides the loop carry and lands in VMEM once at the end.
        last, out = carry
        onehot = lane == last[:, None]
        px = jnp.sum(jnp.where(onehot, x, 0.0), axis=1, keepdims=True)
        py = jnp.sum(jnp.where(onehot, y, 0.0), axis=1, keepdims=True)
        pz = jnp.sum(jnp.where(onehot, z, 0.0), axis=1, keepdims=True)
        d2 = (x - px) ** 2 + (y - py) ** 2 + (z - pz) ** 2
        mind = jnp.minimum(mind_ref[:], jnp.where(elig, d2, -1.0))
        mind_ref[:] = mind
        nxt = jnp.argmax(mind, axis=1).astype(jnp.int32)
        out = jnp.where(col == j, nxt[:, None], out)
        return nxt, out

    init = (jnp.zeros((bt,), jnp.int32), jnp.zeros((bt, m), jnp.int32))
    _, out = lax.fori_loop(1, m, body, init, unroll=False)
    out_ref[:] = out  # column 0 stays 0: FPS seeds index 0


@functools.partial(
    jax.jit, static_argnames=("n_samples", "skip_near_origin", "interpret")
)
def fps_pallas(
    xyz: Array,
    n_samples: int,
    skip_near_origin: bool = True,
    interpret: bool = False,
) -> Array:
    """FPS indices ``[B, n_samples] int32`` for ``xyz [B, N, 3]``."""
    b, n, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    if skip_near_origin:
        elig = (x * x + y * y + z * z > 1e-3).astype(jnp.float32)
    else:
        elig = jnp.ones((b, n), jnp.float32)

    # Mosaic mis-legalizes the in-kernel argmax when the lane dim is a
    # single 128 tile (n <= 128 → an f32→i32 unrealized cast; hit by
    # PointConv-partseg's 64→36 SA layer). Pad the lane dim to >= 256
    # with ineligible points — they sit at -1 in the min-distance cache
    # and never win the argmax, so indices are unchanged.
    pad_n = (256 - n) if n < 256 else (-n) % 128
    if pad_n:
        padl = lambda a: jnp.pad(a, ((0, 0), (0, pad_n)))
        x, y, z, elig = padl(x), padl(y), padl(z), padl(elig)
        n += pad_n

    # batch tile: 5 live [Bt, N] f32 buffers + the index tile
    bt = max(8, min(b, _VMEM_BUDGET // max(1, n * 4 * 5) // 8 * 8))
    bt = min(bt, 512)
    pad_b = (-b) % bt
    if pad_b:
        pad = lambda a: jnp.pad(a, ((0, pad_b), (0, 0)))
        x, y, z, elig = pad(x), pad(y), pad(z), pad(elig)

    grid = ((b + pad_b) // bt,)
    spec = pl.BlockSpec((bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _fps_kernel,
        grid=grid,
        in_specs=[spec, spec, spec, spec],
        out_specs=pl.BlockSpec(
            (bt, n_samples), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b + pad_b, n_samples), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bt, n), jnp.float32)],
        interpret=interpret,
    )(x, y, z, elig)
    return out[:b]
