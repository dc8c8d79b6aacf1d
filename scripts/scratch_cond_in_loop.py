"""Feasibility: value-returning lax.cond inside a kernel fori_loop,
branches with different lane-width temporaries (window vs full)."""

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kern(s_ref, wide_ref, q_ref, idx_ref, out_ref, *, cm, w):
    n, c = q_ref.shape[1], q_ref.shape[2]
    mt, k = idx_ref.shape[1], idx_ref.shape[2]
    nch = mt // cm
    pid = pl.program_id(0)
    lane_w = lax.broadcasted_iota(jnp.int32, (cm, k, w), 2)
    lane_n = lax.broadcasted_iota(jnp.int32, (cm, k, n), 2)

    def body(i, _):
        idx = idx_ref[0, pl.ds(i * cm, cm), :]
        s = s_ref[pid * nch + i]

        def narrow(_):
            qw = q_ref[0, pl.ds(s, w), :].astype(jnp.bfloat16)
            oh = (lane_w == (idx - s)[:, :, None]).astype(jnp.bfloat16)
            return jnp.dot(oh.reshape(cm * k, w), qw,
                           preferred_element_type=jnp.float32)

        def wide(_):
            oh = (lane_n == idx[:, :, None]).astype(jnp.bfloat16)
            return jnp.dot(oh.reshape(cm * k, n),
                           q_ref[0].astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)

        g = lax.cond(wide_ref[pid * nch + i] == 0, narrow, wide, 0)
        out_ref[0, pl.ds(i * cm, cm), :, :] = g.reshape(cm, k, c)
        return 0

    lax.fori_loop(0, nch, body, 0)


def main():
    B, N, M, K, C, W, MT, CM = 2, 1024, 128, 16, 64, 256, 64, 8
    nch = MT // CM
    ntiles = M // MT
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)

    idx = np.zeros((B, M, K), np.int32)
    starts = np.zeros((B, ntiles, nch), np.int32)
    wide = np.zeros((B, ntiles, nch), np.int32)
    rows = 0
    for b in range(B):
        for t in range(ntiles):
            for ci in range(nch):
                r0 = t * MT + ci * CM
                if (t + ci) % 3 == 2:
                    idx[b, r0:r0 + CM] = rng.integers(0, N, (CM, K))
                    wide[b, t, ci] = 1
                else:
                    s = int(rng.integers(0, N - W))
                    s -= s % 8
                    idx[b, r0:r0 + CM] = rng.integers(s, s + W, (CM, K))
                    starts[b, t, ci] = s
                    rows += 1

    out = pl.pallas_call(
        functools.partial(_kern, cm=CM, w=W),
        grid=(B * ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, N, C), lambda i: (i // ntiles, 0, 0)),
            pl.BlockSpec((1, MT, K), lambda i: (i // ntiles, i % ntiles, 0)),
        ],
        out_specs=pl.BlockSpec((1, MT, K, C),
                               lambda i: (i // ntiles, i % ntiles, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, M, K, C), jnp.float32),
    )(jnp.asarray(starts).reshape(-1), jnp.asarray(wide).reshape(-1),
      q, jnp.asarray(idx))

    qb = q.astype(jnp.bfloat16).astype(jnp.float32)
    ref = jnp.take_along_axis(
        qb, jnp.asarray(idx).reshape(B, M * K)[..., None], axis=1
    ).reshape(B, M, K, C)
    print("max err:", float(jnp.max(jnp.abs(out - ref))),
          f"({rows} narrow chunks)")


if __name__ == "__main__":
    main()
