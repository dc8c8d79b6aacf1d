"""Where do canonicalize's 5.5 ms go at B=32 N=4096, and what do the
alternatives cost? (keys / argsort / packed single-sort / gather
routes / combined-payload gather)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def slope(make_chain, *args):
    t2 = bench(jax.jit(lambda *a: make_chain(2, *a)), *args)
    t8 = bench(jax.jit(lambda *a: make_chain(8, *a)), *args)
    return (t8 - t2) / 6.0


def main():
    from pointcloudlib_tpu.ops.spatial import canonicalize, hilbert_keys

    from bench import _surface_clouds

    B, N = 32, 4096
    x, nrm = _surface_clouds(B, N)
    x, nrm = jnp.asarray(x), jnp.asarray(nrm)

    def chain_keys(r, x):
        v = x
        for _ in range(r):
            k = hilbert_keys(v)
            v = v + jnp.max(k).astype(jnp.float32) * 1e-12
        return v

    print(f"hilbert_keys b10:        {slope(chain_keys, x):.2f} ms")

    keys = jax.jit(hilbert_keys)(x)

    def chain_argsort(r, keys):
        v = keys
        for _ in range(r):
            o = jnp.argsort(v, axis=1)
            v = v + o // (1 << 20)
        return v

    print(f"argsort [32,4096] i32:   {slope(chain_argsort, keys):.2f} ms")

    lane = jnp.arange(N, dtype=jnp.int32)[None]

    def chain_packed(r, x):
        v = x
        for _ in range(r):
            k = hilbert_keys(v, bits=6)          # 18 bits
            packed = (k << 12) | lane            # stable: lane in low bits
            s = jnp.sort(packed, axis=1)
            o = s & 0xFFF
            v = v + o[..., None].astype(jnp.float32) * 1e-12
        return v

    print(f"keys b6 + packed sort:   {slope(chain_packed, x):.2f} ms")

    order = jnp.argsort(keys, axis=1).astype(jnp.int32)

    def chain_take2(r, x, nrm, order):
        v, w = x, nrm
        for _ in range(r):
            from pointcloudlib_tpu.ops.spatial import take_rows
            v = take_rows(v, order)
            w = take_rows(w, order)
        return v + w

    print(f"take_rows xyz + feats:   {slope(chain_take2, x, nrm, order):.2f} ms")

    def chain_take_comb(r, x, nrm, order):
        from pointcloudlib_tpu.ops.spatial import take_rows
        v = jnp.concatenate([x, nrm], axis=-1)
        for _ in range(r):
            v = take_rows(v, order)
        return v

    print(f"take_rows combined [.,6]: "
          f"{slope(chain_take_comb, x, nrm, order):.2f} ms")

    def chain_take_xla(r, x, nrm, order):
        v = jnp.concatenate([x, nrm], axis=-1)
        for _ in range(r):
            v = jnp.take_along_axis(v, order[..., None], axis=1)
        return v

    print(f"take_along_axis [.,6]:    "
          f"{slope(chain_take_xla, x, nrm, order):.2f} ms")

    def chain_full(r, x, nrm):
        v, w = x, nrm
        for _ in range(r):
            v, w, o = canonicalize(v, w)
        return v + w

    print(f"canonicalize(x, feats):   {slope(chain_full, x, nrm):.2f} ms")


if __name__ == "__main__":
    main()
