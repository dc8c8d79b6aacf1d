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


def normalize_reference_keys(state_dict: Mapping) -> Dict:
    """Normalize a reference (jittor) ``state_dict`` to torch-style
    dotted paths.

    The reference saves ``net.state_dict()`` via ``jt.save``
    (train_cls.py:455-470); jittor's ``Sequential``/``ModuleList``
    store children under a ``layers`` dict (the reference itself
    iterates ``self.mlps.layers.items()``, networks/cls/pointnet2.py),
    so depending on jittor version the saved keys may carry ``.layers``
    path segments that torch-style keys don't. Strip them and coerce
    values to float32 numpy, so every ``*_from_torch`` /
    ``*_from_reference`` importer accepts either convention:

        ckpt = jt.load("best_chkp.tar")["model_state_dict"]  # their side
        vars = pointnet2_from_reference(normalize_reference_keys(ckpt))
    """
    out: Dict = {}
    for k, v in state_dict.items():
        parts = [p for p in k.split(".") if p != "layers"]
        out[".".join(parts)] = np.asarray(v, np.float32)
    return out


def _seq_triplets(sd: Mapping, prefix: str, n_layers: int):
    """build_mlps Sequential(Conv, BN, ReLU) triplets — conv at 3i,
    BN at 3i+1 (networks/cls/pointnet2.py:18-31) → DenseBNAct tree."""
    p, s = {}, {}
    for i in range(n_layers):
        bnp, bns = _bn(sd, f"{prefix}.{3 * i + 1}")
        p[f"DenseBNAct_{i}"] = {
            "Dense_0": _dense(sd, f"{prefix}.{3 * i}"),
            "BatchNorm_0": bnp,
        }
        s[f"DenseBNAct_{i}"] = {"BatchNorm_0": bns}
    return p, s


def pointnet2_from_reference(state_dict: Mapping, msg: bool = False) -> Dict:
    """Map a reference PointNet++-cls ``state_dict`` onto our
    variables, using the reference's own module tree
    (networks/cls/pointnet2.py:101-188):

    * ``pointnet_modules.{m}.mlps.{g}.{3i}/{3i+1}`` — build_mlps
      Sequential(Conv, BN, ReLU) triplets (conv bias=False under BN,
      pointnet2.py:26);
    * ``fc_layer.{0,1,3,4,7}`` — Linear/BN head with Dropout at 6.

    ``msg=False`` maps PointNet2_cls (SSG: 3 single-scale modules);
    ``msg=True`` maps PointNetMSG (2 × 3-scale modules + group-all,
    pointnet2.py:160-188). Run jittor checkpoints through
    ``normalize_reference_keys`` first.
    """
    sd = dict(state_dict)

    def _stack(prefix, n_layers):
        return _seq_triplets(sd, prefix, n_layers)

    params: Dict = {}
    stats: Dict = {}
    if msg:
        for m in range(2):
            mp, ms = {}, {}
            for g in range(3):
                p, s = _stack(f"pointnet_modules.{m}.mlps.{g}", 3)
                mp[f"PointMLP_{g}"] = p
                ms[f"PointMLP_{g}"] = s
            params[f"SetAbstractionMSG_{m}"] = mp
            stats[f"SetAbstractionMSG_{m}"] = ms
        p, s = _stack("pointnet_modules.2.mlps.0", 3)
        params["SetAbstraction_0"] = {"PointMLP_0": p}
        stats["SetAbstraction_0"] = {"PointMLP_0": s}
    else:
        for m in range(3):
            p, s = _stack(f"pointnet_modules.{m}.mlps.0", 3)
            params[f"SetAbstraction_{m}"] = {"PointMLP_0": p}
            stats[f"SetAbstraction_{m}"] = {"PointMLP_0": s}
    hp, hs = {}, {}
    for li, (dpref, bpref) in enumerate(
        [("fc_layer.0", "fc_layer.1"), ("fc_layer.3", "fc_layer.4")]
    ):
        bnp, bns = _bn(sd, bpref)
        hp[f"DenseBNAct_{li}"] = {"Dense_0": _dense(sd, dpref),
                                  "BatchNorm_0": bnp}
        hs[f"DenseBNAct_{li}"] = {"BatchNorm_0": bns}
    hp["Dense_0"] = _dense(sd, "fc_layer.7")
    params["_ClsHead_0"] = hp
    stats["_ClsHead_0"] = hs
    return {"params": params, "batch_stats": stats}


def _fold_dense_bn(sd: Mapping, dpref: str, bpref: str):
    """(Dense params, BN params, BN stats) for a reference
    conv/linear-with-bias feeding a BatchNorm, folding the bias into
    the running mean (exact — see pointconv_from_reference)."""
    d = _dense(sd, dpref)
    bnp, bns = _bn(sd, bpref)
    if "bias" in d:
        bns = dict(bns)
        bns["mean"] = bns["mean"] - d.pop("bias")
    return d, bnp, bns


def pointnet_partseg_from_reference(state_dict: Mapping) -> Dict:
    """Map a reference PointNet_partseg ``state_dict``
    (networks/seg/pointnet_partseg.py:14-37 + the STN3d/STNkd at
    misc/layers.py:9-103) onto our ``PointNetPartSeg`` variables.

    Unlike the cls PointNet (bias=False convs), every partseg conv and
    the STN fc1/fc2 carry default biases under BN — folded into the
    running means. ``stn.fc3`` / ``fstn.fc3`` / ``convs4`` biases are
    kept (our Denses have them).
    Run jittor checkpoints through ``normalize_reference_keys`` first.
    """
    sd = dict(state_dict)

    def _blk(dpref: str, bpref: str):
        d, bnp, bns = _fold_dense_bn(sd, dpref, bpref)
        return ({"Dense_0": d, "BatchNorm_0": bnp},
                {"BatchNorm_0": bns})

    def _stn(prefix: str):
        p: Dict = {"PointMLP_0": {}, "PointMLP_1": {}}
        s: Dict = {"PointMLP_0": {}, "PointMLP_1": {}}
        for i in range(3):
            bp, bs = _blk(f"{prefix}.conv{i + 1}", f"{prefix}.bn{i + 1}")
            p["PointMLP_0"][f"DenseBNAct_{i}"] = bp
            s["PointMLP_0"][f"DenseBNAct_{i}"] = bs
        for i, (d, b) in enumerate([("fc1", "bn4"), ("fc2", "bn5")]):
            bp, bs = _blk(f"{prefix}.{d}", f"{prefix}.{b}")
            p["PointMLP_1"][f"DenseBNAct_{i}"] = bp
            s["PointMLP_1"][f"DenseBNAct_{i}"] = bs
        p["Dense_0"] = _dense(sd, f"{prefix}.fc3")
        return p, s

    params: Dict = {}
    stats: Dict = {}
    params["STN_0"], stats["STN_0"] = _stn("stn")
    params["STN_1"], stats["STN_1"] = _stn("fstn")
    for i in range(4):  # conv1..4 → PointMLP_0..3
        bp, bs = _blk(f"conv{i + 1}", f"bn{i + 1}")
        params[f"PointMLP_{i}"] = {"DenseBNAct_0": bp}
        stats[f"PointMLP_{i}"] = {"DenseBNAct_0": bs}
    bp, bs = _blk("conv5", "bn5")  # no-relu block
    params["DenseBNAct_0"] = bp
    stats["DenseBNAct_0"] = bs
    hp: Dict = {}
    hs: Dict = {}
    for i in range(3):  # convs1..3 → head PointMLP_4
        bp, bs = _blk(f"convs{i + 1}", f"bns{i + 1}")
        hp[f"DenseBNAct_{i}"] = bp
        hs[f"DenseBNAct_{i}"] = bs
    params["PointMLP_4"] = hp
    stats["PointMLP_4"] = hs
    params["Dense_0"] = _dense(sd, "convs4")
    return {"params": params, "batch_stats": stats}


def dgcnn_partseg_from_reference(state_dict: Mapping) -> Dict:
    """Map a reference DGCNN_partseg ``state_dict``
    (networks/seg/dgcnn_partseg.py:36-84: ``conv{1..10}`` =
    Sequential(bias-free Conv, BN, LeakyReLU) and the bias-free final
    ``conv11``) onto our UNFUSED ``DGCNNPartSeg`` variables
    (DenseBNAct_0..9 + Dense_0). The BN lives at Sequential slot 1
    (``conv{i}.1``; the bare ``bn{i}`` aliases the same tensors).

    For the fused Pallas serving path, pass the result through
    ``convert_variables`` against a fused-model init template.
    Run jittor checkpoints through ``normalize_reference_keys`` first.
    """
    sd = dict(state_dict)
    params: Dict = {}
    stats: Dict = {}
    for i in range(10):
        bnp, bns = _bn(sd, f"conv{i + 1}.1")
        params[f"DenseBNAct_{i}"] = {
            "Dense_0": _dense(sd, f"conv{i + 1}.0"),
            "BatchNorm_0": bnp,
        }
        stats[f"DenseBNAct_{i}"] = {"BatchNorm_0": bns}
    params["Dense_0"] = _dense(sd, "conv11")
    return {"params": params, "batch_stats": stats}


def pointnet2_partseg_from_reference(state_dict: Mapping) -> Dict:
    """Map a reference PointNet2_partseg ``state_dict``
    (networks/seg/pointnet2_partseg.py:110-157) onto our
    ``PointNet2PartSeg`` variables: the same ``pointnet_modules`` SA
    triplets as cls, ``fp3/fp2/fp1`` PointNetFeaturePropagation stacks
    (Conv1d WITH bias under BN — folded into the running mean like
    pointconv, misc/ops.py:61-64), and the ``fc_layer.{0,1,3}`` head
    (its conv bias is kept — our head Dense has one).
    Run jittor checkpoints through ``normalize_reference_keys`` first.
    """
    sd = dict(state_dict)
    params: Dict = {}
    stats: Dict = {}
    for m in range(3):
        p, s = _seq_triplets(sd, f"pointnet_modules.{m}.mlps.0", 3)
        params[f"SetAbstraction_{m}"] = {"PointMLP_0": p}
        stats[f"SetAbstraction_{m}"] = {"PointMLP_0": s}
    for i, ref in enumerate(("fp3", "fp2", "fp1")):
        # mlp_convs/mlp_bns pairs with the Conv1d bias folded into the
        # running mean — same walk as the PointConv stacks
        p, s = _pconv_stack(sd, ref, fold_bias=True)
        params[f"FeaturePropagation_{i}"] = {"PointMLP_0": p}
        stats[f"FeaturePropagation_{i}"] = {"PointMLP_0": s}
    bnp, bns = _bn(sd, "fc_layer.1")
    params["DenseBNAct_0"] = {"Dense_0": _dense(sd, "fc_layer.0"),
                              "BatchNorm_0": bnp}
    stats["DenseBNAct_0"] = {"BatchNorm_0": bns}
    params["Dense_0"] = _dense(sd, "fc_layer.3")
    return {"params": params, "batch_stats": stats}


def _pcnn_dense(sd: Mapping, prefix: str, with_bn: bool = True):
    """Reference Dense_Conv1d/2d (.linear 1x1 conv + .bn) -> DenseBlock."""
    p: Dict = {"Dense_0": _dense(sd, f"{prefix}.linear")}
    s = None
    if with_bn:
        bnp, bns = _bn(sd, f"{prefix}.bn")
        p["BatchNorm_0"] = bnp
        s = {"BatchNorm_0": bns}
    return p, s


def _pcnn_xconv(sd: Mapping, prefix: str, dm: int):
    """Reference XConv (misc/layers.py:413-517) -> our XConv params."""
    p: Dict = {}
    s: Dict = {}
    for i, sub in enumerate(("dense1", "dense2")):
        dp, ds = _pcnn_dense(sd, f"{prefix}.{sub}")
        p[f"DenseBlock_{i}"] = dp
        s[f"DenseBlock_{i}"] = ds
    w = np.asarray(sd[f"{prefix}.x_trans_0.conv.weight"], np.float32)
    kk, dims, _, k = w.shape
    kernel = np.ascontiguousarray(
        w[:, :, 0, :].transpose(2, 1, 0).reshape(k * dims, kk))
    bnp, bns = _bn(sd, f"{prefix}.x_trans_0.bn")
    p["DenseBlock_2"] = {
        "Dense_0": {"kernel": kernel,
                    "bias": np.zeros((kk,), np.float32)},
        "BatchNorm_0": bnp,
    }
    s["DenseBlock_2"] = {"BatchNorm_0": bns}
    dp, ds = _pcnn_dense(sd, f"{prefix}.x_trans_1")
    p["DenseBlock_3"] = dp
    s["DenseBlock_3"] = ds
    dp, _ = _pcnn_dense(sd, f"{prefix}.x_trans_2", with_bn=False)
    p["DenseBlock_4"] = dp
    w0 = np.asarray(sd[f"{prefix}.end_conv.f.conv.0.weight"], np.float32)
    cdm, _, _, k = w0.shape
    c = cdm // dm
    p["depthwise"] = np.ascontiguousarray(
        w0[:, 0, 0, :].reshape(c, dm, k).transpose(0, 2, 1))
    p["depthwise_bias"] = np.asarray(
        sd[f"{prefix}.end_conv.f.conv.0.bias"], np.float32)
    p["Dense_0"] = _dense(sd, f"{prefix}.end_conv.f.conv.1")
    bnp, bns = _bn(sd, f"{prefix}.end_conv.f.bn")
    p["BatchNorm_0"] = bnp
    s["BatchNorm_0"] = bns
    return p, s


def pointcnn_from_reference(state_dict: Mapping) -> Dict:
    """Map a reference PointCNN-cls ``state_dict``
    (networks/cls/pointcnn.py:23-38: ``pcnn1`` + ``pcnn2.{0..2}``
    RandPointCNN stages + ``fcn.{0..2}`` head) onto our
    ``PointCNNCls`` variables.

    Reference key shapes (misc/layers.py):

    * ``…pointcnn.dense.f`` — the lift Dense_Conv1d behind the
      EndChannels1d wrapper (``.f``, layers.py:122-130,374);
    * ``…x_conv.dense{1,2}`` / ``x_trans_{1,2}`` — 1×1 Dense_Conv2d
      (conv bias kept, ours has one too);
    * ``…x_conv.x_trans_0.conv`` — a (1,K) Conv over [dims, K]
      (bias=False under BN): weight [K², dims, 1, K] reshaped to our
      Dense kernel over the K-major flattened local coords;
    * ``…x_conv.end_conv.f.conv.0`` — depthwise (1,K) conv with
      groups=C (weight [C·dm, 1, 1, K] → our ``depthwise`` [C, K, dm];
      same group-major channel order) + its bias → ``depthwise_bias``;
      ``conv.1`` — the 1×1 pointwise (bias=False under BN).

    Run jittor checkpoints through ``normalize_reference_keys`` first
    (it leaves the literal ``.f`` wrapper segment alone).
    """
    sd = dict(state_dict)
    layers = [("pcnn1", 3, 48), ("pcnn2.0", 48, 96),
              ("pcnn2.1", 96, 192), ("pcnn2.2", 192, 384)]
    params: Dict = {}
    stats: Dict = {}
    for i, (pref, c_in, c_out) in enumerate(layers):
        dm = -(-c_out // c_in)  # ceil, layers.py:371
        lp: Dict = {}
        ls: Dict = {}
        dp, ds = _pcnn_dense(sd, f"{pref}.pointcnn.dense.f")
        lp["DenseBlock_0"] = dp
        ls["DenseBlock_0"] = ds
        xp, xs = _pcnn_xconv(sd, f"{pref}.pointcnn.x_conv", dm)
        lp["XConv_0"] = xp
        ls["XConv_0"] = xs
        params[f"PointCNNLayer_{i}"] = lp
        stats[f"PointCNNLayer_{i}"] = ls
    for i, (pref, with_bn) in enumerate(
        [("fcn.0", True), ("fcn.1", True), ("fcn.2", False)]
    ):
        dp, ds = _pcnn_dense(sd, pref, with_bn)
        params[f"DenseBlock_{i}"] = dp
        if ds:
            stats[f"DenseBlock_{i}"] = ds
    return {"params": params, "batch_stats": stats}


def pointcnn_partseg_from_reference(state_dict: Mapping,
                                    part_num: int = 50) -> Dict:
    """Map a reference PointCNN_partseg ``state_dict``
    (networks/seg/pointcnn_partseg.py:17-47: ``encoder_{0..3}``
    RandPointCNN + ``decoder_{0..3}`` RandPointCNN_Decoder) onto our
    ``PointCNNPartSeg`` variables (encoders PointCNNLayer_0..3,
    decoders PointCNNLayer_4..7 + the ``conv_fuse.f`` Dense_Conv1d →
    DenseBlock_0..3). Same XConv weight-shape treatment as the cls
    importer. Run jittor checkpoints through
    ``normalize_reference_keys`` first.
    """
    sd = dict(state_dict)
    params: Dict = {}
    stats: Dict = {}
    enc = [(3, 256), (256, 256), (256, 512), (512, 1024)]
    dec = [(1024, 1024), (1024, 512), (512, 256), (256, part_num)]
    for i, (c_in, c_out) in enumerate(enc + dec):
        pref = (f"encoder_{i}" if i < 4 else f"decoder_{i - 4}")
        dm = -(-c_out // c_in)
        lp: Dict = {}
        ls: Dict = {}
        dp, ds = _pcnn_dense(sd, f"{pref}.pointcnn.dense.f")
        lp["DenseBlock_0"] = dp
        ls["DenseBlock_0"] = ds
        xp, xs = _pcnn_xconv(sd, f"{pref}.pointcnn.x_conv", dm)
        lp["XConv_0"] = xp
        ls["XConv_0"] = xs
        params[f"PointCNNLayer_{i}"] = lp
        stats[f"PointCNNLayer_{i}"] = ls
    for i in range(4):
        dp, ds = _pcnn_dense(sd, f"decoder_{i}.conv_fuse.f")
        params[f"DenseBlock_{i}"] = dp
        stats[f"DenseBlock_{i}"] = ds
    return {"params": params, "batch_stats": stats}


def _pconv_stack(sd: Mapping, prefix: str, fold_bias: bool):
    """mlp_convs/mlp_bns pairs -> DenseBNAct tree; optionally fold the
    conv bias into the BN running mean (our stack Denses are
    biasless)."""
    p: Dict = {}
    s: Dict = {}
    i = 0
    while f"{prefix}.mlp_convs.{i}.weight" in sd:
        d = _dense(sd, f"{prefix}.mlp_convs.{i}")
        bnp, bns = _bn(sd, f"{prefix}.mlp_bns.{i}")
        if fold_bias and "bias" in d:
            bns = dict(bns)
            bns["mean"] = bns["mean"] - d.pop("bias")
        p[f"DenseBNAct_{i}"] = {"Dense_0": d, "BatchNorm_0": bnp}
        s[f"DenseBNAct_{i}"] = {"BatchNorm_0": bns}
        i += 1
    assert i, f"no {prefix}.mlp_convs.* keys"
    return p, s


def _pconv_layer(sd: Mapping, ref: str):
    """One PointConvDensitySetAbstraction/Interpolation
    (pointconv_utils.py:253-400) -> our PointConvSA/Interp params."""
    p: Dict = {}
    s: Dict = {}
    for sub, tpref, fold in (
        ("DensityNet_0", f"{ref}.densitynet", False),
        ("PointMLP_0", ref, True),
        ("WeightNet_0", f"{ref}.weightnet", False),
    ):
        sp, ss = _pconv_stack(sd, tpref, fold)
        p[sub] = sp
        s[sub] = ss
    p["Dense_0"] = _dense(sd, f"{ref}.linear")
    bnp, bns = _bn(sd, f"{ref}.bn_linear")
    p["BatchNorm_0"] = bnp
    s["BatchNorm_0"] = bns
    return p, s


def pointconv_partseg_from_reference(state_dict: Mapping) -> Dict:
    """Map a reference PointConv_partseg ``state_dict``
    (networks/seg/pointconv_partseg.py:12-38: ``sa{0..3}`` SA layers +
    ``in{0..3}`` PointConvDensitySetInterpolation + ``fc1/bn1/fc3``
    head) onto our ``PointConvPartSeg`` variables. Same structure and
    bias-fold rules as the cls importer; the head conv biases are kept
    (ours have them). Run jittor checkpoints through
    ``normalize_reference_keys`` first.
    """
    sd = dict(state_dict)
    params: Dict = {}
    stats: Dict = {}
    for m in range(4):
        p, s = _pconv_layer(sd, f"sa{m}")
        params[f"PointConvSA_{m}"] = p
        stats[f"PointConvSA_{m}"] = s
    for m in range(4):
        p, s = _pconv_layer(sd, f"in{m}")
        params[f"PointConvInterp_{m}"] = p
        stats[f"PointConvInterp_{m}"] = s
    bnp, bns = _bn(sd, "bn1")
    params["DenseBNAct_0"] = {"Dense_0": _dense(sd, "fc1"),
                              "BatchNorm_0": bnp}
    stats["DenseBNAct_0"] = {"BatchNorm_0": bns}
    params["Dense_0"] = _dense(sd, "fc3")
    return {"params": params, "batch_stats": stats}


def pointconv_from_reference(state_dict: Mapping) -> Dict:
    """Map a reference PointConv-cls ``state_dict``
    (networks/cls/pointconv.py:10-21 — ``sa{1..3}`` =
    PointConvDensitySetAbstraction, pointconv_utils.py:340-400) onto
    our ``PointConvDensityCls`` variables.

    Key shapes: every sub-net stores Conv/BN pairs as
    ``…mlp_convs.{i}`` / ``…mlp_bns.{i}`` (SA stack directly under
    ``sa{m}``, plus ``sa{m}.weightnet`` / ``sa{m}.densitynet``);
    ``sa{m}.linear`` + ``sa{m}.bn_linear`` close the layer; the head is
    ``fc1/bn1/fc2/bn2/fc3``.

    The reference's SA convs carry a (BN-redundant) bias
    (pointconv_utils.py:349 ``nn.Conv`` default) that our biasless
    Dense-under-BN drops — it is folded into the BN running mean
    (``mean' = mean − b``), which is exact: in train mode a pre-BN bias
    cancels in the batch mean, and in eval mode normalization sees
    ``(Wx + b) − mean = Wx − (mean − b)``. WeightNet/DensityNet and
    the linear/fc layers keep their biases (ours have them too).
    Run jittor checkpoints through ``normalize_reference_keys`` first.
    """
    sd = dict(state_dict)
    params: Dict = {}
    stats: Dict = {}
    for m in range(3):
        p, s = _pconv_layer(sd, f"sa{m + 1}")
        params[f"PointConvSA_{m}"] = p
        stats[f"PointConvSA_{m}"] = s
    for li, (dpref, bpref) in enumerate([("fc1", "bn1"), ("fc2", "bn2")]):
        bnp, bns = _bn(sd, bpref)
        params[f"DenseBNAct_{li}"] = {"Dense_0": _dense(sd, dpref),
                                      "BatchNorm_0": bnp}
        stats[f"DenseBNAct_{li}"] = {"BatchNorm_0": bns}
    params["Dense_0"] = _dense(sd, "fc3")
    return {"params": params, "batch_stats": stats}


def kpcnn_from_reference(state_dict: Mapping, cfg=None) -> Dict:
    """Map a reference KPCNN ``state_dict`` onto our KPCNN variables.

    Walks ``cfg.architecture`` exactly as both walkers do (reference
    networks/cls/kpconv.py:70-110 builds ``block_ops.{i}``; our
    ``models.kpconv.KPCNN`` auto-numbers ``SimpleBlock_j`` /
    ``ResnetBottleneckBlock_j`` / ``UnaryBlock_j`` per type in the same
    order). Reference key shapes (networks/cls/blocks.py):

    * ``…KPConv.weights`` [P, in, out] — copied as-is (same layout);
      deformable adds ``…KPConv.offset_conv.weights`` and
      ``…KPConv.offset_bias`` (blocks.py:167-189);
    * ``…unary*.mlp.weight`` [out, in] — transposed to a Dense kernel;
      ``unary1`` exists only when ``in_dim != out_dim // 4`` and
      ``unary_shortcut`` only when ``in_dim != out_dim``
      (blocks.py:556-589, otherwise ``nn.Identity`` — no keys);
    * ``…batch_norm.batch_norm.{weight,bias,running_mean,running_var}``
      (BatchNormBlock wrapping BatchNorm1d, blocks.py:404-435) or, with
      ``use_bn=False`` (both heads), ``…batch_norm.bias``.

    Run jittor checkpoints through ``normalize_reference_keys`` first.
    """
    from pointcloudlib_tpu.models.kpconv.model import KPConvConfig

    cfg = cfg or KPConvConfig()
    sd = dict(state_dict)

    def _bnorm(prefix: str, use_bn: bool):
        if not use_bn:
            return ({"bias": np.asarray(sd[f"{prefix}.bias"],
                                        np.float32)}, None)
        return _bn(sd, f"{prefix}.batch_norm")

    def _unary(prefix: str, use_bn: bool):
        p: Dict = {"Dense_0": _dense(sd, f"{prefix}.mlp")}
        bp, bs = _bnorm(f"{prefix}.batch_norm", use_bn)
        p["MaskedBatchNorm_0"] = bp
        return p, ({"MaskedBatchNorm_0": bs} if bs is not None else None)

    def _kconv(prefix: str, deformable: bool):
        p: Dict = {"weights": np.asarray(sd[f"{prefix}.weights"],
                                         np.float32)}
        if deformable:
            p["offset_conv"] = {
                "weights": np.asarray(
                    sd[f"{prefix}.offset_conv.weights"], np.float32)
            }
            p["offset_bias"] = np.asarray(
                sd[f"{prefix}.offset_bias"], np.float32)
        return p

    params: Dict = {}
    stats: Dict = {}
    counts = {"SimpleBlock": 0, "ResnetBottleneckBlock": 0,
              "UnaryBlock": 0}

    def _emit(kind: str, p: Dict, s) -> None:
        name = f"{kind}_{counts[kind]}"
        counts[kind] += 1
        params[name] = p
        if s:
            stats[name] = s

    in_dim = cfg.in_features_dim
    out_dim = cfg.first_features_dim
    bi = 0
    for block in cfg.architecture:
        if "global" in block or "upsample" in block:
            break
        deform = "deformable" in block
        ref = f"block_ops.{bi}"
        bi += 1
        if "simple" in block:
            bp, bs = _bnorm(f"{ref}.batch_norm", cfg.use_batch_norm)
            _emit("SimpleBlock",
                  {"KPConvOp_0": _kconv(f"{ref}.KPConv", deform),
                   "MaskedBatchNorm_0": bp},
                  {"MaskedBatchNorm_0": bs} if bs is not None else None)
            in_dim = out_dim // 2
        elif "resnetb" in block:
            p: Dict = {}
            s: Dict = {}
            u = 0
            if in_dim != out_dim // 4:
                up, us = _unary(f"{ref}.unary1", cfg.use_batch_norm)
                p[f"UnaryBlock_{u}"] = up
                if us:
                    s[f"UnaryBlock_{u}"] = us
                u += 1
            p["KPConvOp_0"] = _kconv(f"{ref}.KPConv", deform)
            bp, bs = _bnorm(f"{ref}.batch_norm_conv", cfg.use_batch_norm)
            p["MaskedBatchNorm_0"] = bp
            if bs is not None:
                s["MaskedBatchNorm_0"] = bs
            up, us = _unary(f"{ref}.unary2", cfg.use_batch_norm)
            p[f"UnaryBlock_{u}"] = up
            if us:
                s[f"UnaryBlock_{u}"] = us
            u += 1
            if in_dim != out_dim:
                up, us = _unary(f"{ref}.unary_shortcut",
                                cfg.use_batch_norm)
                p[f"UnaryBlock_{u}"] = up
                if us:
                    s[f"UnaryBlock_{u}"] = us
            _emit("ResnetBottleneckBlock", p, s)
            in_dim = out_dim
        elif block == "unary":
            up, us = _unary(ref, cfg.use_batch_norm)
            _emit("UnaryBlock", up, us)
            in_dim = out_dim
        else:
            raise ValueError(f"unknown block {block!r}")
        if "strided" in block:
            out_dim *= 2
    for head in ("head_mlp", "head_softmax"):
        up, us = _unary(head, use_bn=False)
        _emit("UnaryBlock", up, us)
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


# --------------------------------------------------------------------
# Fused ↔ unfused parameter-tree conversion.
#
# The fused Pallas model paths (FusedSetAbstraction, FusedEdgeConv)
# declare flat parameter trees (w1/w2/w3 + bn*_scale/bias) while the
# unfused XLA paths nest PointMLP/DenseBNAct/Dense/BatchNorm — so a
# checkpoint trained on TPU (fused) doesn't restore on CPU (unfused)
# and vice versa. ``convert_variables`` re-shapes a variables tree to
# match a target template (an ``init`` of the destination-backend
# model), translating between the two layouts wherever they differ and
# copying everything else through. Values are identical — the fused
# path computes the same math from the same weights.
#
# DGCNNPartSeg: its fused pair layers (Fused2EdgeConv packs TWO
# DenseBNActs) shift the positional numbering of the head blocks —
# handled by a dedicated level mapper (_dgcnn_partseg_level), detected
# by the Fused2EdgeConv_0 key.


def _sa_unpack(fsa: Mapping, stats: bool) -> Dict:
    """FusedSetAbstraction leaves → PointMLP/DenseBNAct tree."""
    out = {}
    for i in range(3):
        if stats:
            out[f"DenseBNAct_{i}"] = {"BatchNorm_0": {
                "mean": fsa[f"mean{i + 1}"], "var": fsa[f"var{i + 1}"]}}
        else:
            out[f"DenseBNAct_{i}"] = {
                "Dense_0": {"kernel": fsa[f"w{i + 1}"]},
                "BatchNorm_0": {"scale": fsa[f"bn{i + 1}_scale"],
                                "bias": fsa[f"bn{i + 1}_bias"]},
            }
    return out


def _sa_pack(pm: Mapping, stats: bool) -> Dict:
    out = {}
    for i in range(3):
        blk = pm[f"DenseBNAct_{i}"]
        if stats:
            out[f"mean{i + 1}"] = blk["BatchNorm_0"]["mean"]
            out[f"var{i + 1}"] = blk["BatchNorm_0"]["var"]
        else:
            out[f"w{i + 1}"] = blk["Dense_0"]["kernel"]
            out[f"bn{i + 1}_scale"] = blk["BatchNorm_0"]["scale"]
            out[f"bn{i + 1}_bias"] = blk["BatchNorm_0"]["bias"]
    return out


def _edge_unpack(fe: Mapping, stats: bool) -> Dict:
    if stats:
        return {"BatchNorm_0": {"mean": fe["mean"], "var": fe["var"]}}
    return {"Dense_0": {"kernel": fe["w"]},
            "BatchNorm_0": {"scale": fe["bn_scale"],
                            "bias": fe["bn_bias"]}}


def _edge_pack(db: Mapping, stats: bool) -> Dict:
    if stats:
        return {"mean": db["BatchNorm_0"]["mean"],
                "var": db["BatchNorm_0"]["var"]}
    return {"w": db["Dense_0"]["kernel"],
            "bn_scale": db["BatchNorm_0"]["scale"],
            "bn_bias": db["BatchNorm_0"]["bias"]}


def _edge2_unpack(fe: Mapping, stats: bool, which: int) -> Dict:
    """One of Fused2EdgeConv's two packed layers → a DenseBNAct tree."""
    if stats:
        return {"BatchNorm_0": {"mean": fe[f"mean{which}"],
                                "var": fe[f"var{which}"]}}
    return {"Dense_0": {"kernel": fe["w" if which == 1 else "w2"]},
            "BatchNorm_0": {"scale": fe[f"bn{which}_scale"],
                            "bias": fe[f"bn{which}_bias"]}}


def _edge2_pack(d1: Mapping, d2: Mapping, stats: bool) -> Dict:
    if stats:
        return {"mean1": d1["BatchNorm_0"]["mean"],
                "var1": d1["BatchNorm_0"]["var"],
                "mean2": d2["BatchNorm_0"]["mean"],
                "var2": d2["BatchNorm_0"]["var"]}
    return {"w": d1["Dense_0"]["kernel"],
            "w2": d2["Dense_0"]["kernel"],
            "bn1_scale": d1["BatchNorm_0"]["scale"],
            "bn1_bias": d1["BatchNorm_0"]["bias"],
            "bn2_scale": d2["BatchNorm_0"]["scale"],
            "bn2_bias": d2["BatchNorm_0"]["bias"]}


def _dgcnn_partseg_level(src: Mapping, tgt: Mapping,
                         stats: bool) -> Dict:
    """DGCNNPartSeg top level: the fused branch declares
    Fused2EdgeConv_0/1 + FusedEdgeConv_0 where the unfused one has
    DenseBNAct_0..4, so the tail blocks renumber by 5
    (models/dgcnn.py:DGCNNPartSeg)."""
    out: Dict = {}
    if "Fused2EdgeConv_0" in tgt:  # unfused → fused
        for i in range(2):
            out[f"Fused2EdgeConv_{i}"] = _edge2_pack(
                src[f"DenseBNAct_{2 * i}"],
                src[f"DenseBNAct_{2 * i + 1}"], stats)
        out["FusedEdgeConv_0"] = _edge_pack(src["DenseBNAct_4"], stats)
        for key in tgt:
            if key.startswith("DenseBNAct_"):
                out[key] = src[f"DenseBNAct_{int(_suffix(key)) + 5}"]
            elif key == "Dense_0":
                out[key] = src["Dense_0"]
            elif key not in out:
                raise KeyError(
                    f"cannot convert: target key {key!r} unknown to the "
                    f"DGCNNPartSeg mapper")
    else:  # fused → unfused
        for i in range(2):
            fe = src[f"Fused2EdgeConv_{i}"]
            out[f"DenseBNAct_{2 * i}"] = _edge2_unpack(fe, stats, 1)
            out[f"DenseBNAct_{2 * i + 1}"] = _edge2_unpack(fe, stats, 2)
        out["DenseBNAct_4"] = _edge_unpack(src["FusedEdgeConv_0"], stats)
        for key in src:
            if key.startswith("DenseBNAct_"):
                out[f"DenseBNAct_{int(_suffix(key)) + 5}"] = src[key]
            elif key == "Dense_0":
                out[key] = src[key]
            elif not key.startswith(("Fused2EdgeConv_", "FusedEdgeConv_")):
                raise KeyError(
                    f"cannot convert: source key {key!r} unknown to the "
                    f"DGCNNPartSeg mapper")
    return out


def _suffix(key: str) -> str:
    return key.rsplit("_", 1)[-1]


def _convert_level(src: Mapping, tgt: Mapping, stats: bool) -> Dict:
    if "Fused2EdgeConv_0" in tgt or "Fused2EdgeConv_0" in src:
        return _dgcnn_partseg_level(src, tgt, stats)
    out = {}
    for key, tval in tgt.items():
        if key in src:
            sval = src[key]
            out[key] = (
                _convert_level(sval, tval, stats)
                if isinstance(tval, Mapping) else sval
            )
        elif key.startswith("FusedSetAbstraction_") and (
                f"PointMLP_{_suffix(key)}" in src):
            out[key] = _sa_pack(src[f"PointMLP_{_suffix(key)}"], stats)
        elif key.startswith("PointMLP_") and (
                f"FusedSetAbstraction_{_suffix(key)}" in src):
            out[key] = _sa_unpack(
                src[f"FusedSetAbstraction_{_suffix(key)}"], stats)
        elif key.startswith("FusedEdgeConv_") and (
                f"DenseBNAct_{_suffix(key)}" in src):
            out[key] = _edge_pack(src[f"DenseBNAct_{_suffix(key)}"], stats)
        elif key.startswith("DenseBNAct_") and (
                f"FusedEdgeConv_{_suffix(key)}" in src):
            out[key] = _edge_unpack(
                src[f"FusedEdgeConv_{_suffix(key)}"], stats)
        else:
            raise KeyError(
                f"cannot convert: target key {key!r} has no source "
                f"counterpart among {sorted(src)[:8]}"
            )
    return out


def convert_variables(src: Mapping, template: Mapping) -> Dict:
    """Re-shape a flax ``variables`` tree between the fused and unfused
    model layouts, using an ``init`` of the destination-backend model
    as the structural template."""
    out = {"params": _convert_level(src["params"], template["params"],
                                    stats=False)}
    if "batch_stats" in template:
        out["batch_stats"] = _convert_level(
            src.get("batch_stats", {}), template["batch_stats"],
            stats=True)
    return out


# Importer registry: (model registry name, "cls"|"seg") -> state_dict
# converter. The CLI's --diff-checkpoint and any programmatic migration
# resolve through this instead of hard-coding per-family function names.
_IMPORTERS = {
    ("pointnet", "cls"): pointnet_from_torch,
    ("pointnet2", "cls"): pointnet2_from_reference,
    ("pointnet2_msg", "cls"):
        lambda sd: pointnet2_from_reference(sd, msg=True),
    ("dgcnn", "cls"): dgcnn_from_torch,
    ("pointcnn", "cls"): pointcnn_from_reference,
    ("pointconv", "cls"): pointconv_from_reference,
    ("kpconv", "cls"): kpcnn_from_reference,
    ("kpconv_deform", "cls"): kpcnn_from_reference,
    ("pointnet", "seg"): pointnet_partseg_from_reference,
    ("pointnet2", "seg"): pointnet2_partseg_from_reference,
    ("dgcnn", "seg"): dgcnn_partseg_from_reference,
    ("pointcnn", "seg"): pointcnn_partseg_from_reference,
    ("pointconv", "seg"): pointconv_partseg_from_reference,
}


def get_importer(model_name: str, kind: str = "cls"):
    """The torch->flax state_dict converter for a model-zoo entry."""
    try:
        return _IMPORTERS[(model_name, kind)]
    except KeyError:
        raise KeyError(
            f"no torch importer for ({model_name!r}, {kind!r}); "
            f"have {sorted(_IMPORTERS)}") from None
