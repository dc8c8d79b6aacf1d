"""Losses and metrics — vectorized (the reference builds one-hots in a
Python loop per batch row, train_cls.py:40-44; that hazard is gone)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

Array = jax.Array


def soft_cross_entropy(
    logits: Array, labels: Array, smoothing: bool = True, eps: float = 0.2
) -> Array:
    """Label-smoothed CE matching soft_cross_entropy_loss
    (reference train_cls.py:31-50): true class ``1-eps``, others
    ``eps/(n_class-1)``.

    Note this differs from optax's ``smooth_labels`` convention
    (``1-eps+eps/n`` / ``eps/n``) — we reproduce the reference exactly.
    """
    logits = logits.astype(jnp.float32)
    if not smoothing:
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()
    n_class = logits.shape[-1]
    one_hot = jax.nn.one_hot(labels.reshape(-1), n_class, dtype=logits.dtype)
    soft = one_hot * (1.0 - eps) + (1.0 - one_hot) * (eps / (n_class - 1))
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -(soft * logp).sum(axis=-1).mean()


def cross_entropy_seg(logits: Array, seg: Array,
                      reduce: bool = True) -> Array:
    """Per-point CE over ``[B, N, parts]`` logits (reference
    train_partseg.py:116 flattens to ``[B*N, parts]``).
    ``reduce=False`` returns the per-point losses ``[B, N]`` so the
    caller can weight padded samples out."""
    per = optax.softmax_cross_entropy_with_integer_labels(
        logits.reshape(-1, logits.shape[-1]).astype(jnp.float32),
        seg.reshape(-1),
    )
    return per.mean() if reduce else per.reshape(seg.shape)


def accuracy(logits: Array, labels: Array) -> Array:
    return (jnp.argmax(logits, axis=-1) == labels.reshape(logits.shape[:-1])).mean()
