"""Cross-framework checkpoint import (torch → flax).

The reference's only numerical-verification tool is a hook that loads a
PyTorch checkpoint and diffs activations layer by layer
(jittor_utils.auto_diff, reference train_cls.py:330-361). The analogue
here: import a torch ``state_dict`` into our parameter pytree, so (a)
users migrating from torch implementations keep their weights and (b)
tests can assert bit-level architecture parity against an independent
torch definition (tests/test_torch_parity.py).

Mapping rules (torch → flax):
* ``Conv1d(in, out, 1)`` / ``Linear(in, out)`` weight ``[out, in(,1)]``
  → Dense kernel ``[in, out]`` (transpose);
* ``BatchNorm1d``: weight/bias → scale/bias params; running_mean/var →
  batch_stats mean/var.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _dense(sd: Mapping, prefix: str) -> Dict:
    w = np.asarray(sd[f"{prefix}.weight"], np.float32)
    if w.ndim == 3:  # Conv1d kernel_size=1: [out, in, 1]
        w = w[..., 0]
    elif w.ndim == 4:  # Conv2d kernel_size=1: [out, in, 1, 1]
        w = w[..., 0, 0]
    out = {"kernel": np.ascontiguousarray(w.T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"], np.float32)
    return out


def _bn(sd: Mapping, prefix: str):
    params = {
        "scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
        "bias": np.asarray(sd[f"{prefix}.bias"], np.float32),
    }
    stats = {
        "mean": np.asarray(sd[f"{prefix}.running_mean"], np.float32),
        "var": np.asarray(sd[f"{prefix}.running_var"], np.float32),
    }
    return params, stats


def dgcnn_from_torch(state_dict: Mapping) -> Dict:
    """Map a torch DGCNN-cls state_dict (reference layout:
    conv1..conv4 EdgeConvs + conv5 + linear1..3 + bn1..7,
    networks/cls/dgcnn.py:61-92) onto our DGCNN variables."""
    params: Dict = {}
    stats: Dict = {}

    def _block(dense_prefix, bn_prefix):
        bnp, bns = _bn(state_dict, bn_prefix)
        return (
            {"Dense_0": _dense(state_dict, dense_prefix),
             "BatchNorm_0": bnp},
            {"BatchNorm_0": bns},
        )

    for i in range(4):  # EdgeConv_0..3 ← conv1..conv4 (+bn1..4)
        p, s = _block(f"conv{i + 1}", f"bn{i + 1}")
        params[f"EdgeConv_{i}"] = {"DenseBNAct_0": p}
        stats[f"EdgeConv_{i}"] = {"DenseBNAct_0": s}
    # conv5 (512→1024, bn5), linear1 (2048→512, bn6), linear2 (512→256, bn7)
    for name, (dense, bn) in {
        "DenseBNAct_0": ("conv5", "bn5"),
        "DenseBNAct_1": ("linear1", "bn6"),
        "DenseBNAct_2": ("linear2", "bn7"),
    }.items():
        p, s = _block(dense, bn)
        params[name] = p
        stats[name] = s
    params["Dense_0"] = _dense(state_dict, "linear3")
    return {"params": params, "batch_stats": stats}


def pointnet_from_torch(state_dict: Mapping) -> Dict:
    """Map a torch PointNet-cls state_dict (reference layout:
    conv1..conv5 + bn1..bn5 + linear1 + bn6 + linear2,
    networks/cls/pointnet.py:9-27) onto our PointNet variables."""
    params: Dict = {}
    stats: Dict = {}

    # PointMLP([64,64,64,128,1024]) → DenseBNAct_0..4 under PointMLP_0
    mlp_p, mlp_s = {}, {}
    for i in range(5):
        blk = f"DenseBNAct_{i}"
        dp, ds = {}, {}
        dp["Dense_0"] = _dense(state_dict, f"conv{i + 1}")
        bnp, bns = _bn(state_dict, f"bn{i + 1}")
        dp["BatchNorm_0"] = bnp
        ds["BatchNorm_0"] = bns
        mlp_p[blk] = dp
        mlp_s[blk] = ds
    params["PointMLP_0"] = mlp_p
    stats["PointMLP_0"] = mlp_s

    # head: DenseBNAct_0 (linear1+bn6) + Dense_0 (linear2)
    hp, hs = {}, {}
    hp["Dense_0"] = _dense(state_dict, "linear1")
    bnp, bns = _bn(state_dict, "bn6")
    hp["BatchNorm_0"] = bnp
    hs["BatchNorm_0"] = bns
    params["DenseBNAct_0"] = hp
    stats["DenseBNAct_0"] = hs
    params["Dense_0"] = _dense(state_dict, "linear2")

    return {"params": params, "batch_stats": stats}
