"""A/B the windowed path at the N=1024 headline config (real step)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np


def main():
    import jax.numpy as jnp

    from pointcloudlib_tpu.models import get_cls_model
    from pointcloudlib_tpu.train import (
        create_train_state, make_cls_train_step, sgd_momentum, step_decay,
    )

    B, N = 64, 1024
    rng = np.random.default_rng(0)
    xyz = rng.standard_normal((B, N, 3)).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    batch = {
        "xyz": jnp.asarray(xyz),
        "feats": jnp.asarray(
            rng.standard_normal((B, N, 3)).astype(np.float32)),
        "label": jnp.asarray(np.arange(B) % 40, jnp.int32),
    }
    model = get_cls_model("pointnet2", n_classes=40)
    key = jax.random.key(0)
    tx = sgd_momentum(step_decay(0.1), momentum=0.9)
    state = create_train_state(model, key, batch["xyz"][:1],
                               batch["feats"][:1], tx)
    step = make_cls_train_step(model, mesh=None)

    s = state
    for _ in range(3):
        s, m = step(s, batch, key)
    jax.device_get(m["loss"])
    t0 = time.perf_counter()
    for _ in range(15):
        s, m = step(s, batch, key)
    jax.device_get(m["loss"])
    ms = (time.perf_counter() - t0) / 15 * 1e3
    print(f"N=1024 step: {ms:.2f} ms ({B / (ms / 1e3):.0f} samples/s)")


if __name__ == "__main__":
    main()
