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

    The reference LRScheduler's *formula* (misc/utils.py:8-19), with
    ``step`` counting samples; callers stepping per batch scale
    ``decay_step`` by the batch size to match. NOTE: the reference CLIs
    never actually drive this formula with a growing step — see
    :func:`reference_flat_lr` for the schedule they effectively run.
    """

    def schedule(step):
        factor = decay ** jnp.floor(step / decay_step)
        return base_lr * jnp.maximum(factor, floor_factor)

    return schedule


def reference_flat_lr(
    base_lr: float, n_train: int, batch_size: int,
    drop_last: bool = False,
) -> float:
    """The lr the reference CLIs *effectively* train at: a constant.

    Both reference training loops step their LRScheduler with the same
    argument every epoch (train_cls.py:475, train_partseg.py:86:
    ``lr_scheduler.step(len(loader) * batch_size)``), so the decay
    exponent ``int(n/15000)`` never grows. For ModelNet40 (9840 train
    clouds) and ShapeNetPart trainval (14007) it is 0 — every published
    non-KPConv accuracy was trained at a flat base lr. This reproduces
    the computation (including the >=15000-sample dataset case) rather
    than the scheduler's apparent intent. ``drop_last`` matches the
    loader feeding it: jittor datasets default to False (ceil batch
    count — the ModelNet40 loader), while the ShapeNetPart loader sets
    True (shapenet_loader.py:86, floor) — the two can differ by one
    decay exponent at the 15000-sample boundary.
    """
    n_batches = (n_train // batch_size if drop_last
                 else -(-n_train // batch_size))
    decay = 0.6 ** int(n_batches * batch_size / 15000)
    return base_lr * max(decay, 2e-5)


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
