"""kpcnn_from_reference round-trip: a state_dict with the reference's
key scheme (block_ops.{i} + head_mlp/head_softmax,
networks/cls/kpconv.py:70-110, blocks.py:404-623) imports into exactly
our KPCNN init tree — structure and values — including through
normalize_reference_keys with jittor-style `.layers` segments.

The inverse walk below is built from the reference source cited in the
importer docstring; the test pins both directions to the same scheme
and to our flax auto-numbering (a renamed module or a shifted counter
fails the exact-tree comparison).
"""

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudlib_tpu.models.kpconv.model import KPCNN, KPConvConfig
from pointcloudlib_tpu.utils.interop import (
    kpcnn_from_reference,
    normalize_reference_keys,
)

ARCH = ("simple", "resnetb", "resnetb_strided",
        "resnetb_deformable", "global_average")


def _to_reference_sd(variables, cfg):
    """Inverse of kpcnn_from_reference: our variables -> reference keys."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd = {}

    def put_unary(prefix, p, s, use_bn):
        sd[f"{prefix}.mlp.weight"] = np.asarray(
            p["Dense_0"]["kernel"]).T
        put_bnorm(f"{prefix}.batch_norm", p["MaskedBatchNorm_0"],
                  (s or {}).get("MaskedBatchNorm_0"), use_bn)

    def put_bnorm(prefix, bp, bs, use_bn):
        if not use_bn:
            sd[f"{prefix}.bias"] = np.asarray(bp["bias"])
            return
        sd[f"{prefix}.batch_norm.weight"] = np.asarray(bp["scale"])
        sd[f"{prefix}.batch_norm.bias"] = np.asarray(bp["bias"])
        sd[f"{prefix}.batch_norm.running_mean"] = np.asarray(bs["mean"])
        sd[f"{prefix}.batch_norm.running_var"] = np.asarray(bs["var"])

    def put_kconv(prefix, p):
        sd[f"{prefix}.weights"] = np.asarray(p["weights"])
        if "offset_conv" in p:
            sd[f"{prefix}.offset_conv.weights"] = np.asarray(
                p["offset_conv"]["weights"])
            sd[f"{prefix}.offset_bias"] = np.asarray(p["offset_bias"])

    counts = {"SimpleBlock": 0, "ResnetBottleneckBlock": 0,
              "UnaryBlock": 0}

    def take(kind):
        name = f"{kind}_{counts[kind]}"
        counts[kind] += 1
        return params[name], stats.get(name, {})

    in_dim, out_dim, bi = cfg.in_features_dim, cfg.first_features_dim, 0
    for block in cfg.architecture:
        if "global" in block or "upsample" in block:
            break
        ref = f"block_ops.{bi}"
        bi += 1
        if "simple" in block:
            p, s = take("SimpleBlock")
            put_kconv(f"{ref}.KPConv", p["KPConvOp_0"])
            put_bnorm(f"{ref}.batch_norm", p["MaskedBatchNorm_0"],
                      s.get("MaskedBatchNorm_0"), cfg.use_batch_norm)
            in_dim = out_dim // 2
        elif "resnetb" in block:
            p, s = take("ResnetBottleneckBlock")
            u = 0
            if in_dim != out_dim // 4:
                put_unary(f"{ref}.unary1", p[f"UnaryBlock_{u}"],
                          s.get(f"UnaryBlock_{u}"), cfg.use_batch_norm)
                u += 1
            put_kconv(f"{ref}.KPConv", p["KPConvOp_0"])
            put_bnorm(f"{ref}.batch_norm_conv", p["MaskedBatchNorm_0"],
                      s.get("MaskedBatchNorm_0"), cfg.use_batch_norm)
            put_unary(f"{ref}.unary2", p[f"UnaryBlock_{u}"],
                      s.get(f"UnaryBlock_{u}"), cfg.use_batch_norm)
            u += 1
            if in_dim != out_dim:
                put_unary(f"{ref}.unary_shortcut", p[f"UnaryBlock_{u}"],
                          s.get(f"UnaryBlock_{u}"), cfg.use_batch_norm)
            in_dim = out_dim
        if "strided" in block:
            out_dim *= 2
    for head in ("head_mlp", "head_softmax"):
        p, s = take("UnaryBlock")
        put_unary(head, p, s, use_bn=False)
    return sd


def test_kpcnn_reference_roundtrip():
    cfg = KPConvConfig(
        num_classes=5, architecture=ARCH,
        neighborhood_limits=(12, 12), first_subsampling_dl=0.12,
    )
    model = KPCNN(cfg)
    rng = np.random.default_rng(3)
    xyz = jnp.asarray(rng.standard_normal((1, 96, 3)), jnp.float32)
    variables = jax.jit(
        lambda k, x: model.init(k, x, training=False)
    )(jax.random.key(0), xyz)
    variables = jax.tree.map(np.asarray, dict(variables))
    variables.pop("intermediates", None)  # sown reg_loss, not weights

    sd = _to_reference_sd(variables, cfg)
    # jittor spelling: ModuleList children under `.layers`
    jsd = {}
    for k, v in sd.items():
        jsd[".".join(f"layers.{s}" if s.isdigit() else s
                     for s in k.split("."))] = v
    got = kpcnn_from_reference(normalize_reference_keys(jsd), cfg)

    want_paths = jax.tree_util.tree_leaves_with_path(variables)
    got_paths = jax.tree_util.tree_leaves_with_path(got)
    assert [p for p, _ in got_paths] == [p for p, _ in want_paths]
    for (path, want), (_, g) in zip(want_paths, got_paths):
        np.testing.assert_array_equal(g, want, err_msg=str(path))
