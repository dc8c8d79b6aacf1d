"""Worker for tests/test_multihost.py — one process of a 2-process
CPU 'multi-host' run (4 virtual devices per process, global mesh 8).

Usage: _multihost_worker.py <coordinator> <num_procs> <pid>
Prints one line: MH_LOSS <loss> so the parent can compare processes.
"""

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    addr, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from pointcloudlib_tpu.parallel.multihost import (
        global_mesh,
        host_local_batch_to_global,
        initialize_multihost,
    )

    if nproc > 1:
        ok = initialize_multihost(addr, nproc, pid)
        assert ok, "distributed init failed"

    import jax

    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    import jax.numpy as jnp  # noqa: F401

    from pointcloudlib_tpu.models import get_cls_model
    from pointcloudlib_tpu.train import (
        create_train_state,
        make_cls_train_step,
        sgd_momentum,
        step_decay,
    )

    mesh = global_mesh()
    model = get_cls_model("pointnet", n_classes=8)

    # the GLOBAL batch is deterministic; each process materializes its
    # own half (batch 16 over 8 devices -> 8 rows per process)
    rng = np.random.default_rng(0)
    gxyz = rng.standard_normal((16, 64, 3)).astype(np.float32)
    glabel = (np.arange(16) % 8).astype(np.int32)
    share = 16 // nproc
    lo, hi = pid * share, (pid + 1) * share
    batch = host_local_batch_to_global(
        mesh, {"xyz": gxyz[lo:hi], "label": glabel[lo:hi]})

    key = jax.random.key(0)
    tx = sgd_momentum(step_decay(0.1), momentum=0.9)
    state = create_train_state(model, key, gxyz[:1], None, tx)

    from pointcloudlib_tpu.parallel import replicate

    state = replicate(mesh, state)
    step = make_cls_train_step(model, mesh)
    with mesh:
        for _ in range(2):
            state, metrics = step(state, batch, key)
    loss = float(jax.device_get(metrics["loss"]))
    print(f"MH_LOSS {loss:.8f}", flush=True)

    # The step real multi-chip Pallas training uses: shard_map DP with
    # sync-BN psums over the global (cross-process) mesh axis, fused
    # kernels in interpret mode. PointNet++ at tiny shapes, as
    # __graft_entry__.dryrun_multichip does single-process.
    os.environ["POINTCLOUDLIB_FUSED_SA"] = "1"
    fxyz = np.asarray(rng.standard_normal((16, 128, 3)), np.float32)
    ffeats = np.asarray(rng.standard_normal((16, 128, 3)), np.float32)
    fbatch = host_local_batch_to_global(
        mesh, {"xyz": fxyz[lo:hi], "feats": ffeats[lo:hi],
               "label": glabel[lo:hi]})
    fmodel = get_cls_model("pointnet2", n_classes=8,
                           axis_name="data", world=8)
    fstate = create_train_state(fmodel, key, fxyz[:2], ffeats[:2], tx)
    fstate = replicate(mesh, fstate)
    fstep = make_cls_train_step(fmodel, mesh, axis_name="data")
    with mesh:
        fstate, fmetrics = fstep(fstate, fbatch, key)
    floss = float(jax.device_get(fmetrics["loss"]))
    print(f"MH_FLOSS {floss:.8f}", flush=True)


if __name__ == "__main__":
    main()
