"""Inference / serving API.

The reference has no inference path beyond its eval loops; production
serving needs one compiled program per shape and no host round-trips.
``Predictor`` wraps a trained classification or part-segmentation model:

* checkpoint restore (orbax, utils/checkpoint.py);
* shape bucketing — inputs are padded to the next bucket so a handful of
  compiled programs serve any cloud size (XLA recompiles per shape
  otherwise);
* batched, jit-ed, donated inference with softmax outputs on device and
  only the final probabilities fetched.

Example::

    from pointcloudlib_tpu.inference import Predictor
    p = Predictor.from_checkpoint("checkpoints/pointnet2", "pointnet2")
    probs = p.predict_proba(clouds)           # [B, 40]
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudlib_tpu.models import get_cls_model, get_seg_model
from pointcloudlib_tpu.utils.checkpoint import CheckpointManager

# power-of-two-ish point-count buckets: few programs, bounded padding
_BUCKETS = (128, 256, 512, 1024, 2048, 4096)


def _restore_required(mgr, variables, which: str):
    """Restore ``which`` (falling back to "current") or raise —
    serving randomly-initialized weights silently is never right."""
    restored = mgr.restore_variables(
        variables["params"], variables.get("batch_stats"), name=which
    ) or mgr.restore_variables(
        variables["params"], variables.get("batch_stats"), name="current"
    )
    if restored is None:
        raise FileNotFoundError(
            f"no '{which}' or 'current' checkpoint under "
            f"{mgr.directory} — "
            "refusing to serve randomly-initialized weights")
    params, batch_stats = restored
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats
    return variables


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return n


def _pad_points(arrays, n):
    """Pad each [B, n, ...] array up to the shape bucket by repeating
    real points (cyclic resample — the standard undersized-cloud
    treatment). Repetition keeps the geometry real: duplicated points
    add no new max-pool values and never create phantom origin points
    in kNN graphs, which zero padding would. ``None`` entries pass."""
    nb = _bucket(n)
    if nb == n:
        return arrays
    sel = np.arange(nb - n) % n
    return [a if a is None
            else np.concatenate([a, a[:, sel]], axis=1)
            for a in arrays]


def _batches(arrays, batch_size):
    """Yield ``(chunks, real)`` with every array padded to a full
    batch by repeating the last row; ``real`` rows are genuine."""
    b = len(arrays[0])
    for s in range(0, b, batch_size):
        chunks = [None if a is None else a[s:s + batch_size]
                  for a in arrays]
        real = len(chunks[0])
        if real < batch_size:
            reps = batch_size - real
            chunks = [None if c is None
                      else np.concatenate([c, np.repeat(c[-1:], reps, 0)])
                      for c in chunks]
        yield chunks, real


class Predictor:
    def __init__(
        self,
        model,
        variables,
        with_normals: bool = False,
        batch_size: int = 32,
    ):
        self.model = model
        self.variables = variables
        self.with_normals = with_normals
        self.batch_size = batch_size

        @functools.partial(jax.jit, static_argnames=())
        def _forward(variables, xyz, feats):
            # Hilbert-canonicalize when a fused kernel will window at
            # this size (same gate as the trainer; class output is
            # point-order-invariant so nothing to un-sort)
            from pointcloudlib_tpu.ops.pallas.fused_sa import _window_width
            from pointcloudlib_tpu.ops.spatial import canonicalize

            if _window_width(xyz.shape[1]) is not None:
                xyz, feats, _ = canonicalize(xyz, feats)
            logits = model.apply(variables, xyz, feats, training=False)
            return jax.nn.softmax(logits, axis=-1)

        self._forward = _forward

    @classmethod
    def from_checkpoint(
        cls,
        ckpt_dir: str | Path,
        model_name: str,
        n_classes: int = 40,
        with_normals: Optional[bool] = None,
        which: str = "best",
        sample_points: int = 1024,
    ) -> "Predictor":
        model = get_cls_model(model_name, n_classes=n_classes)
        if with_normals is None:
            with_normals = model_name.startswith("pointnet2")
        dummy = jnp.zeros((1, sample_points, 3), jnp.float32)
        feats = dummy if with_normals else None
        from pointcloudlib_tpu.train.state import init_variables

        variables = init_variables(model, jax.random.key(0), dummy, feats)
        mgr = CheckpointManager(Path(ckpt_dir))
        variables = _restore_required(mgr, variables, which)
        return cls(model, variables, with_normals=with_normals)

    def predict_proba(
        self,
        clouds: np.ndarray,
        normals: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """``clouds [B, N, 3]`` → class probabilities ``[B, C]``.

        Pads N up to the shape bucket by **repeating real points**
        (cyclic resample, the standard undersized-cloud treatment) and B
        up to the serving batch size. Repetition keeps the geometry
        real: duplicated points add no new max-pool values (PointNet is
        exactly invariant) and never create phantom origin points in
        kNN graphs (DGCNN/PointCNN), which zero padding would.
        """
        clouds = np.asarray(clouds, np.float32)
        if self.with_normals and normals is None:
            raise ValueError(
                "this model consumes surface normals as features "
                "(with_normals=True); pass normals=[B, N, 3], or "
                "construct the Predictor with with_normals=False for a "
                "checkpoint trained without them")
        b, n, _ = clouds.shape
        if normals is not None:
            normals = np.asarray(normals, np.float32)
        clouds, normals = _pad_points([clouds, normals], n)
        outs = []
        for (chunk, nchunk), real in _batches([clouds, normals],
                                              self.batch_size):
            feats = jnp.asarray(nchunk) if self.with_normals else None
            probs = self._forward(self.variables, jnp.asarray(chunk), feats)
            outs.append(np.asarray(probs)[:real])
        return np.concatenate(outs)

    def predict(self, clouds, normals=None) -> np.ndarray:
        return self.predict_proba(clouds, normals).argmax(-1)


class SegPredictor:
    """Part-segmentation serving: per-point part probabilities.

    Same bucketing/batching as Predictor; takes the object category so
    the one-hot conditioning matches training (train_partseg._prep).
    """

    def __init__(self, model, variables, with_xyz_feats: bool = False,
                 batch_size: int = 16):
        self.model = model
        self.variables = variables
        self.with_xyz_feats = with_xyz_feats
        self.batch_size = batch_size

        def _forward(variables, xyz, onehot, feats):
            from pointcloudlib_tpu.ops.pallas.fused_sa import _window_width
            from pointcloudlib_tpu.ops.spatial import (
                canonicalize, unsort_rows,
            )

            order = None
            if _window_width(xyz.shape[1]) is not None:
                xyz, feats, order = canonicalize(xyz, feats)
            logits = model.apply(variables, xyz, onehot, feats=feats,
                                 training=False)
            probs = jax.nn.softmax(logits, axis=-1)
            # per-point outputs return in the caller's original order
            return probs if order is None else unsort_rows(probs, order)

        self._forward = jax.jit(_forward)

    @classmethod
    def from_checkpoint(
        cls,
        ckpt_dir: str | Path,
        model_name: str,
        part_num: int = 50,
        which: str = "best",
        sample_points: int = 2048,
    ) -> "SegPredictor":
        from pointcloudlib_tpu.train.state import init_variables

        model = get_seg_model(model_name, part_num=part_num)
        with_xyz = model_name.startswith("pointnet2")
        dummy = jnp.zeros((1, sample_points, 3), jnp.float32)
        onehot = jnp.zeros((1, 16), jnp.float32)
        variables = init_variables(
            model, jax.random.key(0), dummy, onehot,
            feats=dummy if with_xyz else None,
        )
        mgr = CheckpointManager(Path(ckpt_dir))
        variables = _restore_required(mgr, variables, which)
        return cls(model, variables, with_xyz_feats=with_xyz)

    def predict(self, clouds: np.ndarray, labels: np.ndarray) -> np.ndarray:
        """``clouds [B, N, 3]``, ``labels [B]`` category ids →
        per-point part ids ``[B, N]``."""
        clouds = np.asarray(clouds, np.float32)
        b, n, _ = clouds.shape
        # padded-tail predictions are dropped below ([:real, :n])
        [clouds] = _pad_points([clouds], n)
        onehot_all = np.eye(16, dtype=np.float32)[np.asarray(labels)]
        outs = []
        for (chunk, oh), real in _batches([clouds, onehot_all],
                                          self.batch_size):
            feats = jnp.asarray(chunk) if self.with_xyz_feats else None
            probs = self._forward(
                self.variables, jnp.asarray(chunk), jnp.asarray(oh), feats
            )
            outs.append(np.asarray(probs).argmax(-1)[:real, :n])
        return np.concatenate(outs)
