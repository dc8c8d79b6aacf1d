"""Step factories: one jit-ed, donated, mesh-sharded train step.

Replaces the reference's per-step host syncs (train_cls.py:73-75 pulls
``.data`` every iteration, serializing the pipeline) — metrics stay on
device and are fetched asynchronously by the loop.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pointcloudlib_tpu.parallel.mesh import (
    Mesh,
    shard_train_step,
    replicated,
    batch_sharding,
)
from pointcloudlib_tpu.ops.spatial import canonicalize, unsort_rows
from pointcloudlib_tpu.train.losses import soft_cross_entropy
from pointcloudlib_tpu.train.state import TrainState


def _canon_batch(batch):
    """Hilbert-canonicalize the batch's point order inside the step
    (ops/spatial.py): clouds are unordered sets — the reference itself
    randomly permutes points at load time
    (data_utils/modelnet40_loader.py:121) — and spatially-sorted order
    makes the fused kernels' gather windows tight. Per-point arrays
    (feats/seg) ride along; ``order`` is returned for callers that
    must un-sort per-point outputs (None when skipped).

    Skipped when no fused kernel would window at this size (the gate
    mirrors fused_sa._window_width) — sorting costs ~0.3-0.7 ms per
    step and only pays through tighter gather windows."""
    from pointcloudlib_tpu.ops.pallas.fused_sa import _window_width

    if _window_width(batch["xyz"].shape[1]) is None:
        return batch, None
    out = dict(batch)
    per_point = [k for k in ("feats", "seg") if k in batch]
    sorted_all = canonicalize(batch["xyz"],
                              *[batch[k] for k in per_point])
    out["xyz"] = sorted_all[0]
    for k, v in zip(per_point, sorted_all[1:-1]):
        out[k] = v
    return out, sorted_all[-1]


def make_cls_train_step(
    model,
    mesh: Optional[Mesh] = None,
    smoothing: bool = True,
    axis_name: Optional[str] = None,
):
    """Build ``step(state, batch, rng) -> (state, metrics)`` for
    classification. ``batch = {"xyz", "feats" (optional), "label"}``.

    ``axis_name`` requires ``mesh``: build a shard_map DP step instead
    of jit-SPMD —
    required when the model contains Pallas kernels and the mesh spans
    real chips; the model must be constructed with the same axis_name
    so its BatchNorms sync (see parallel/mesh.py:shard_map_train_step).
    """
    if axis_name is not None and mesh is None:
        # fail at the misconfiguration site, not as an unbound-axis
        # trace error on the first step
        raise ValueError("axis_name requires a mesh (the shard_map DP "
                         "step binds the axis to a mesh dimension)")

    def loss_fn(params, state: TrainState, batch, rng):
        batch, _ = _canon_batch(batch)
        variables = {"params": params}
        mutable = ["intermediates"]
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
            mutable.append("batch_stats")
        logits, mut = model.apply(
            variables,
            batch["xyz"],
            batch.get("feats"),
            training=True,
            mutable=mutable,
            rngs={"dropout": rng},
        )
        loss = soft_cross_entropy(logits, batch["label"], smoothing=smoothing)
        overflow = None
        if "intermediates" in mut:
            # deformable-KPConv (and any other module) can sow scalar
            # auxiliary losses under the name "reg_loss"; KPCNN also
            # sows its truncated-voxel count (observability, not loss)
            from pointcloudlib_tpu.models.kpconv.model import (
                sum_overflow,
                sum_reg_losses,
            )

            loss = loss + sum_reg_losses(mut["intermediates"])
            overflow = sum_overflow(mut["intermediates"])
        acc = (jnp.argmax(logits, -1) == batch["label"]).mean()
        return loss, (mut.get("batch_stats"), acc, overflow)

    def step(state: TrainState, batch, rng):
        (loss, (bs, acc, overflow)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state, batch, rng)
        if axis_name is not None:
            # shard_map DP: grads/metrics are local partials; the
            # batch_stats are already global (sync-BN via axis_name)
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
            acc = jax.lax.pmean(acc, axis_name)
            if overflow is not None:
                overflow = jax.lax.psum(overflow, axis_name)
        state = state.apply_gradients(grads=grads)
        if bs is not None:
            state = state.replace(batch_stats=bs)
        metrics = {"loss": loss, "acc": acc}
        if overflow is not None:
            # count of voxels clipped by the static pyramid caps this
            # step — nonzero = re-calibrate (--kp-buckets / caps)
            metrics["voxel_overflow"] = overflow
        return state, metrics

    if axis_name is not None and mesh is not None:
        from pointcloudlib_tpu.parallel.mesh import shard_map_train_step

        return shard_map_train_step(step, mesh, axis=axis_name)
    if mesh is not None:
        return shard_train_step(step, mesh)
    return jax.jit(step, donate_argnums=(0,))


def make_cls_eval_step(
    model, mesh: Optional[Mesh] = None, axis_name: Optional[str] = None
):
    """``eval_step(state, batch) -> (correct_count, batch_size)``.

    ``axis_name`` (requires ``mesh``): run the step per shard inside
    shard_map and psum the counts — required on a real multi-chip mesh
    whenever the model contains Pallas kernels (jit-SPMD has no
    partitioner for custom calls; see parallel/mesh.py).
    """
    if axis_name is not None and mesh is None:
        raise ValueError("axis_name requires a mesh")

    def step(state: TrainState, batch):
        cbatch, _ = _canon_batch(batch)
        logits = model.apply(
            state.variables(), cbatch["xyz"], cbatch.get("feats"),
            training=False,
        )
        pred = jnp.argmax(logits, -1)
        valid = batch.get("valid")
        if valid is None:
            valid = jnp.ones_like(pred, dtype=jnp.bool_)
        correct = jnp.sum((pred == batch["label"]) & valid)
        total = jnp.sum(valid)
        if axis_name is not None:
            correct = jax.lax.psum(correct, axis_name)
            total = jax.lax.psum(total, axis_name)
        return correct, total

    if axis_name is not None:
        from pointcloudlib_tpu.parallel.mesh import shard_map_eval_step

        return shard_map_eval_step(step, mesh, axis=axis_name)
    if mesh is not None:
        repl = replicated(mesh)
        data = batch_sharding(mesh)
        return jax.jit(step, in_shardings=(repl, data),
                       out_shardings=(repl, repl))
    return jax.jit(step)


def make_cls_pred_step(
    model,
    mesh: Optional[Mesh] = None,
    axis_name: Optional[str] = None,
    probs: bool = False,
):
    """``pred_step(state, batch) -> [B]`` argmax predictions (or
    ``[B, n_classes]`` softmax probabilities with ``probs=True``).

    Backs the confusion-matrix eval and the voting test (reference
    train_cls.py:230-328); ``axis_name`` routes through shard_map so
    the Pallas models work on real multi-chip meshes.
    """
    if axis_name is not None and mesh is None:
        raise ValueError("axis_name requires a mesh")

    def step(state: TrainState, batch):
        cbatch, _ = _canon_batch(batch)
        logits = model.apply(
            state.variables(), cbatch["xyz"], cbatch.get("feats"),
            training=False,
        )
        return (jax.nn.softmax(logits, -1) if probs
                else jnp.argmax(logits, -1))

    if axis_name is not None:
        from jax.sharding import PartitionSpec as P

        from pointcloudlib_tpu.parallel.mesh import shard_map_eval_step

        return shard_map_eval_step(
            step, mesh, axis=axis_name, out_specs=P(axis_name)
        )
    if mesh is not None:
        repl = replicated(mesh)
        data = batch_sharding(mesh)
        return jax.jit(step, in_shardings=(repl, data), out_shardings=data)
    return jax.jit(step)


def make_seg_train_step(
    model, mesh: Optional[Mesh] = None, axis_name: Optional[str] = None
):
    """Train step for part segmentation.

    ``batch = {"xyz", "cls_onehot", "feats"?, "seg"}``; plain CE per point
    (reference train_partseg.py:116).

    ``axis_name`` (requires ``mesh``): build the shard_map DP step —
    required when the model contains Pallas kernels (jit-SPMD has no
    partitioner for custom calls; parallel/mesh.py). The model must be
    constructed with the same axis_name so its BatchNorms sync. Loss
    and accuracy normalize by the GLOBAL valid count (psum of the
    per-shard numerator/denominator), so uneven padding across shards
    still yields exactly the single-device masked mean — grads are
    psum'd (not pmean'd) to match.
    """
    from pointcloudlib_tpu.train.losses import cross_entropy_seg

    if axis_name is not None and mesh is None:
        raise ValueError("axis_name requires a mesh")

    def loss_fn(params, state: TrainState, batch, rng):
        batch, _ = _canon_batch(batch)  # sorts seg labels alongside
        variables = {"params": params}
        mutable = []
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
            mutable = ["batch_stats"]
        if mutable:
            logits, mut = model.apply(
                variables, batch["xyz"], batch["cls_onehot"],
                feats=batch.get("feats"), training=True,
                mutable=mutable, rngs={"dropout": rng},
            )
        else:  # mutable=[] would STILL return an (out, {}) tuple
            logits, mut = model.apply(
                variables, batch["xyz"], batch["cls_onehot"],
                feats=batch.get("feats"), training=True,
                rngs={"dropout": rng},
            ), {}
        # mask padded samples out of BOTH the loss (their gradients
        # would pollute the update) and the accuracy (train currently
        # uses drop_last=True so every row is valid, but the math must
        # stay correct if that ever changes)
        correct = (jnp.argmax(logits, -1) == batch["seg"]).astype(jnp.float32)
        valid = batch.get("valid")
        if valid is not None:
            w = valid.astype(jnp.float32)[:, None]
        else:
            w = jnp.ones((logits.shape[0], 1), jnp.float32)
        per = cross_entropy_seg(logits, batch["seg"], reduce=False)
        denom = jnp.sum(w) * per.shape[1]
        if axis_name is not None:
            # global point count: per-shard losses then SUM (psum in
            # ``step``) to exactly the single-device masked mean. The
            # psum'd denominator has no param dependence — safe under
            # value_and_grad.
            denom = jax.lax.psum(denom, axis_name)
        denom = jnp.maximum(denom, 1.0)
        loss = jnp.sum(per * w) / denom
        acc = jnp.sum(correct * w) / denom
        return loss, (mut.get("batch_stats"), acc)

    def step(state: TrainState, batch, rng):
        (loss, (bs, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state, batch, rng)
        if axis_name is not None:
            # already divided by the GLOBAL denom → sum, not mean
            grads = jax.lax.psum(grads, axis_name)
            loss = jax.lax.psum(loss, axis_name)
            acc = jax.lax.psum(acc, axis_name)
        state = state.apply_gradients(grads=grads)
        if bs is not None:
            state = state.replace(batch_stats=bs)
        return state, {"loss": loss, "acc": acc}

    if axis_name is not None:
        from pointcloudlib_tpu.parallel.mesh import shard_map_train_step

        return shard_map_train_step(step, mesh, axis=axis_name)
    if mesh is not None:
        return shard_train_step(step, mesh)
    return jax.jit(step, donate_argnums=(0,))


def make_seg_eval_step(
    model, mesh: Optional[Mesh] = None, axis_name: Optional[str] = None
):
    """``eval_step(state, batch) -> pred [B, N]`` (IoU is computed on host
    over the whole epoch, reference train_partseg.py:139-158).

    ``axis_name`` (requires ``mesh``): run per shard inside shard_map
    with the per-point predictions gathered back over ``axis`` —
    required for Pallas models on real multi-chip meshes.
    """
    if axis_name is not None and mesh is None:
        raise ValueError("axis_name requires a mesh")

    def step(state: TrainState, batch):
        cbatch, order = _canon_batch(batch)
        logits = model.apply(
            state.variables(), cbatch["xyz"], cbatch["cls_onehot"],
            feats=cbatch.get("feats"), training=False,
        )
        # host-side IoU compares against the caller's original point
        # order — un-sort the per-point predictions
        pred = jnp.argmax(logits, -1)
        return unsort_rows(pred, order) if order is not None else pred

    if axis_name is not None:
        from jax.sharding import PartitionSpec as P

        from pointcloudlib_tpu.parallel.mesh import shard_map_eval_step

        return shard_map_eval_step(
            step, mesh, axis=axis_name, out_specs=P(axis_name)
        )
    if mesh is not None:
        repl = replicated(mesh)
        data = batch_sharding(mesh)
        return jax.jit(step, in_shardings=(repl, data), out_shardings=data)
    return jax.jit(step)
