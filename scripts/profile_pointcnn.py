#!/usr/bin/env python
"""PointCNN-cls pass-level decomposition (VERDICT r4 #7).

Times, on the chip, each piece of the PointCNN cls step at the bench
shape so DESIGN.md can name what bounds the family (MFU 0.010):

  * the full fwd+bwd step (reference point);
  * layer-prefix models (layers 1..L only) -> per-layer marginal cost;
  * the neighbor path standalone per layer (FPS + dilated kNN+gather);
  * XConv's three compute stages standalone at layer shapes:
      lift   - two DenseBlocks over [B,P,K,3->c_mid]
      xmat   - three DenseBlocks [B,P,K*3 -> K^2] + reshape
      mix    - the bpij,bpjc einsum + depthwise + out Dense
    (each timed fwd+bwd as its own jitted program; chained-call
    timing per CLAUDE.md - slopes, never single calls)

Usage: python scripts/profile_pointcnn.py [B] [N]
"""

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from pointcloudlib_tpu.models.pointcnn import (
    DenseBlock, PointCNNLayer, XConv, PointCNNCls)

# cls architecture: (c_in, c_out, k, d, p)
LAYERS = [(3, 48, 8, 1, -1), (48, 96, 12, 2, 384),
          (96, 192, 16, 2, 128), (192, 384, 16, 3, 128)]


def bench(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


class Prefix(nn.Module):
    """First L PointCNN layers only."""
    n: int

    @nn.compact
    def __call__(self, xyz, training=True):
        pts, fts = xyz, xyz
        for (ci, co, k, d, p) in LAYERS[: self.n]:
            pts, fts = PointCNNLayer(ci, co, k=k, d=d, p=p)(
                pts, fts, training)
        return pts, fts


def grad_ms(model, v, *args, **kw):
    """fwd+bwd time of model.apply summed to a scalar."""
    has_bs = "batch_stats" in v

    def loss(params):
        var = {"params": params}
        if has_bs:
            var["batch_stats"] = v["batch_stats"]
        out = model.apply(var, *args, training=True,
                          mutable=["batch_stats"] if has_bs else False,
                          **kw)
        out = out[0] if isinstance(out, tuple) else out
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l) for l in leaves if l.dtype != jnp.int32)

    g = jax.jit(jax.grad(loss))
    return bench(g, v["params"])


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    rng = np.random.default_rng(0)
    xyz = rng.standard_normal((B, N, 3)).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    xyz = jnp.asarray(xyz)

    key = jax.random.key(0)

    # full model fwd+bwd
    model = PointCNNCls(dropout=0.0)
    v = jax.jit(partial(model.init, training=False))(key, xyz)
    full = grad_ms(model, v, xyz)
    print(f"full fwd+bwd:        {full:8.2f} ms "
          f"({B / full * 1e3:.0f} sa/s fwd+bwd only)")

    # layer prefixes -> marginal per-layer cost
    prev = 0.0
    for L in range(1, 5):
        m = Prefix(L)
        vv = jax.jit(partial(m.init, training=False))(key, xyz)
        t = grad_ms(m, vv, xyz)
        print(f"layers 1..{L}:         {t:8.2f} ms   marginal "
              f"{t - prev:6.2f} ms")
        prev = t

    # neighbor path standalone per layer (shapes from the prefix runs)
    from pointcloudlib_tpu.ops.geometry import (
        farthest_point_sample as fps, index_points, knn)
    from pointcloudlib_tpu.ops.pallas.neighbors import knn_gather

    shapes = [(N, 3), (N, 48), (384, 96), (128, 192)]
    for (ci, co, k, d, p), (n_in, c_in) in zip(LAYERS, shapes):
        pts = jnp.asarray(
            rng.standard_normal((B, n_in, 3)), jnp.float32)
        fts = jnp.asarray(
            rng.standard_normal((B, n_in, max(c_in, 3))), jnp.float32)
        m_rep = p if 0 < p < n_in else n_in

        def nbr(pts, fts, p=p, k=k, d=d, m_rep=m_rep, c_in=c_in):
            rep = (index_points(pts, fps(pts, p))
                   if 0 < p < pts.shape[1] else pts)
            if c_in >= 16:
                _, g = knn_gather(
                    rep, pts, jnp.concatenate([pts, fts], -1),
                    k, False, d, True)
                return g
            _, idx = knn(rep, pts, k * d)
            idx = idx[..., ::d]
            return index_points(pts, idx), index_points(fts, idx)

        t = bench(jax.jit(nbr), pts, fts)
        print(f"nbr  L(k={k:2d},d={d},p={m_rep:4d}):"
              f" {t:8.2f} ms")

    # XConv stages standalone, fwd+bwd, at each layer's shape
    for (ci, co, k, d, p), (n_in, c_in) in zip(LAYERS, shapes):
        P = p if 0 < p < n_in else n_in
        c_mid = co // 4 if ci != 0 else co // 2
        dm = int(np.ceil(co / ci)) if ci != 0 else 4
        local = jnp.asarray(
            rng.standard_normal((B, P, k, 3)), jnp.float32)
        cat_c = c_mid + (co // 2 if ci > 3 else c_mid)

        class Lift(nn.Module):
            @nn.compact
            def __call__(self, x, training=True):
                x = DenseBlock(c_mid)(x, training)
                return DenseBlock(c_mid)(x, training)

        class Xmat(nn.Module):
            @nn.compact
            def __call__(self, x, training=True):
                flat = x.reshape(*x.shape[:2], k * 3)
                h = DenseBlock(k * k, act_before_bn=True)(
                    flat, training)
                h = DenseBlock(k * k)(h, training)
                h = DenseBlock(k * k, with_bn=False, act=False)(
                    h, training)
                return h.reshape(*h.shape[:2], k, k)

        class Mix(nn.Module):
            @nn.compact
            def __call__(self, X, cat, training=True):
                h = jnp.einsum("bpij,bpjc->bpic", X, cat,
                               preferred_element_type=jnp.float32)
                c = h.shape[-1]
                dw = self.param("dw", nn.initializers.normal(),
                                (c, k, dm))
                h = jnp.einsum("bpkc,ckm->bpcm", h, dw)
                h = h.reshape(*h.shape[:2], c * dm)
                h = nn.Dense(co, use_bias=False)(h)
                return nn.relu(h)

        lift = Lift()
        vl = jax.jit(partial(lift.init, training=False))(key, local)
        t_l = grad_ms(lift, vl, local)

        xm = Xmat()
        vx = jax.jit(partial(xm.init, training=False))(key, local)
        t_x = grad_ms(xm, vx, local)

        X = jnp.asarray(rng.standard_normal((B, P, k, k)), jnp.float32)
        cat = jnp.asarray(
            rng.standard_normal((B, P, k, cat_c)), jnp.float32)
        mx = Mix()
        vm = jax.jit(partial(mx.init, training=False))(key, X, cat)
        t_m = grad_ms(mx, vm, X, cat)

        print(f"xconv L(P={P:4d},k={k:2d},cat={cat_c:3d},co={co:3d}): "
              f"lift {t_l:7.2f}  xmat {t_x:7.2f}  mix {t_m:7.2f} ms")


if __name__ == "__main__":
    main()
