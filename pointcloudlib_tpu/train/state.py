"""Train state: params + BatchNorm running stats + optimizer state.

One pytree, one jit-ed step, donated buffers — replaces the reference's
implicit Jittor graph executor + nn.SGD.step(loss) (train_cls.py:72).
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None

    def variables(self):
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v


def create_train_state(
    model,
    rng: jax.Array,
    sample_xyz,
    sample_feats,
    tx: optax.GradientTransformation,
) -> TrainState:
    variables = init_variables(model, rng, sample_xyz, sample_feats)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=tx,
    )


def init_variables(model, rng, sample_xyz, sample_feats=None, **kw):
    """jit-compiled model.init.

    Eager init dispatches every traced op individually — on a
    remote-compile TPU backend that is hundreds of tiny compiles and can
    take minutes for graph-heavy models (DGCNN). One jit makes it a
    single compile.
    """
    if sample_feats is None:
        fn = jax.jit(
            lambda r, x: model.init(r, x, None, training=False, **kw)
        )
        return fn(rng, sample_xyz)
    fn = jax.jit(
        lambda r, x, f: model.init(r, x, f, training=False, **kw)
    )
    return fn(rng, sample_xyz, sample_feats)


def sgd_momentum(
    schedule, momentum: float = 0.9, weight_decay: float = 0.0
) -> optax.GradientTransformation:
    """SGD+momentum, the reference's optimizer (train_cls.py:404)."""
    if weight_decay:
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(schedule, momentum=momentum),
        )
    return optax.sgd(schedule, momentum=momentum)
