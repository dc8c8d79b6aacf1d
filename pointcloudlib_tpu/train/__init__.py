"""Training harness: losses, schedules, state, jit-ed step factories."""

from pointcloudlib_tpu.train.losses import (
    accuracy,
    cross_entropy_seg,
    soft_cross_entropy,
)
from pointcloudlib_tpu.train.schedules import (
    cosine_with_warmup,
    reference_flat_lr,
    step_decay,
)
from pointcloudlib_tpu.train.state import (
    TrainState,
    create_train_state,
    sgd_momentum,
)
from pointcloudlib_tpu.train.trainer import (
    make_cls_eval_step,
    make_cls_pred_step,
    make_cls_train_step,
    make_seg_eval_step,
    make_seg_train_step,
)

__all__ = [
    "TrainState",
    "accuracy",
    "cosine_with_warmup",
    "create_train_state",
    "cross_entropy_seg",
    "make_cls_eval_step",
    "make_cls_pred_step",
    "make_cls_train_step",
    "make_seg_eval_step",
    "make_seg_train_step",
    "reference_flat_lr",
    "sgd_momentum",
    "soft_cross_entropy",
    "step_decay",
]
