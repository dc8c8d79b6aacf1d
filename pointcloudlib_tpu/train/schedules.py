"""LR schedules matching the reference training recipes."""

from __future__ import annotations

import jax.numpy as jnp
import optax


def step_decay(
    base_lr: float,
    decay: float = 0.6,
    decay_step: int = 15000,
    floor_factor: float = 2e-5,
) -> optax.Schedule:
    """``lr = base * max(decay^floor(step/decay_step), floor_factor)``.

    The reference LRScheduler (misc/utils.py:8-19). There ``step`` counts
    *samples* (train_cls.py:475 passes epoch*len*batch_size); callers here
    step per batch and scale ``decay_step`` by the batch size to match.
    """

    def schedule(step):
        factor = decay ** jnp.floor(step / decay_step)
        return base_lr * jnp.maximum(factor, floor_factor)

    return schedule


def cosine_with_warmup(
    base_lr: float, warmup_steps: int, total_steps: int, floor: float = 1e-5
) -> optax.Schedule:
    """Standard warmup+cosine for the TPU-native recipes (new capability;
    the reference only has step decay)."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=base_lr,
        warmup_steps=warmup_steps,
        decay_steps=total_steps,
        end_value=floor,
    )
