#!/usr/bin/env python
"""Gradient-parity arm of the pointconv-seg convergence probe.

The no-dropout ablation (probe_pointconv_seg_nodropout.py) did NOT
close the gap vs the reference-keyed torch mirror (7.6 IoU @ ep9 vs
32.5 @ ep7), so the defect is deeper than the head dropout. This probe
isolates math from initialization: import the torch mirror's INIT
weights into our flax model (pointconv_partseg_from_reference), run the
SAME batch through both in train mode, and compare the loss and the
per-module gradient L2 norms (torch grads mapped through the same
importer so the trees align).

 * norms match  -> forward+backward math is fine; the convergence gap
   is the weight-init distribution (flax lecun_normal vs torch
   kaiming_uniform) -> fix our init.
 * norms differ -> a real gradient defect in the flagged module.

CPU-only (PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu).
"""

import os
import sys
from pathlib import Path

# default: CPU (XLA compute paths). PROBE_TPU=1 keeps the axon TPU
# backend so the jax arm runs through the Pallas kernel routes (gather
# custom VJP, fps, knn) — the torch arm is CPU either way, so this
# A/Bs the TPU gradient path against the same torch reference.
if os.environ.get("PROBE_TPU") != "1":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ["PALLAS_AXON_POOL_IPS"] = ""

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

import numpy as np
import torch

import flax.linen as fnn


class _NoDropout(fnn.Module):
    """Dropout is a no-op for this comparison (mirror has none)."""
    rate: float = 0.0
    deterministic: bool = None

    @fnn.compact
    def __call__(self, x, deterministic=None):
        return x


fnn.Dropout = _NoDropout

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

import test_torch_parity_pointconv as tpc  # noqa: E402
from pointcloudlib_tpu.data.synthetic import SyntheticShapeNetPart  # noqa: E402
from pointcloudlib_tpu.models import get_seg_model  # noqa: E402
from pointcloudlib_tpu.utils.interop import (  # noqa: E402
    normalize_reference_keys,
    pointconv_partseg_from_reference,
)

B, N, SEED = 4, 1024, 0


def group_norms(params):
    out = {}
    for top, sub in params.items():
        leaves = jax.tree_util.tree_leaves(sub)
        out[top] = float(jnp.sqrt(sum(jnp.sum(l.astype(jnp.float32) ** 2)
                                      for l in leaves)))
    return out


def main():
    torch.manual_seed(SEED)
    # keep the 1023-step FPS python loop out of the autograd graph
    _fps = tpc.torch_fps_noskip
    tpc.torch_fps_noskip = lambda xyz, m: _fps(xyz.detach(), m)
    tnet = tpc.RefPointConvPartSeg(part_num=50).train()

    ds = SyntheticShapeNetPart(N, 64, True, SEED)
    items = [ds[i] for i in range(B)]
    pts = np.stack([it[0] for it in items]).astype(np.float32)
    seg = np.stack([it[2] for it in items]).astype(np.int64)

    # ---- torch arm ----
    tp = torch.from_numpy(pts)
    logits_t = tnet(tp)
    loss_t = torch.nn.functional.cross_entropy(
        logits_t.reshape(-1, 50), torch.from_numpy(seg).reshape(-1))
    loss_t.backward()

    grad_sd, zero_sd = {}, {}
    for k, v in tnet.state_dict(keep_vars=True).items():
        if v.grad is not None:
            grad_sd[k] = v.grad.detach().numpy()
        else:  # BN running stats: no grad, importer needs the key
            grad_sd[k] = np.zeros_like(v.detach().numpy())
    gvars = pointconv_partseg_from_reference(
        normalize_reference_keys(grad_sd))
    tnorm = group_norms(gvars["params"])

    # ---- jax arm, imported weights ----
    sd = {k: v.detach().numpy() for k, v in
          tnet.state_dict(keep_vars=True).items()}
    variables = pointconv_partseg_from_reference(
        normalize_reference_keys(sd))
    model = get_seg_model("pointconv", part_num=50)
    onehot = jnp.zeros((B, 16), jnp.float32)

    def loss_fn(params):
        logits, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(pts), onehot, training=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.key(0)},
        )
        per = optax.softmax_cross_entropy_with_integer_labels(
            logits.reshape(-1, 50).astype(jnp.float32),
            jnp.asarray(seg).reshape(-1))
        return per.mean(), logits

    (loss_j, logits_j), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(variables["params"])
    jnorm = group_norms(grads)

    print(f"loss   torch={float(loss_t):.4f}  jax={float(loss_j):.4f}")
    lt = logits_t.detach().numpy()
    lj = np.asarray(logits_j)
    print(f"logits torch mean={lt.mean():+.4f} std={lt.std():.4f}  "
          f"jax mean={lj.mean():+.4f} std={lj.std():.4f}")
    print(f"{'module':20s} {'|g| torch':>12s} {'|g| jax':>12s} {'ratio':>8s}")
    for k in sorted(set(tnorm) | set(jnorm)):
        a, b = tnorm.get(k, float('nan')), jnorm.get(k, float('nan'))
        r = b / a if a else float('inf')
        print(f"{k:20s} {a:12.4e} {b:12.4e} {r:8.3f}")


if __name__ == "__main__":
    main()
