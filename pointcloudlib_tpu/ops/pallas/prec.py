"""Matmul-precision pin for Pallas kernel bodies.

The kernels' dots take bf16 operands with f32 accumulation
(``preferred_element_type``) and leave ``precision`` unset. An
application-level ``jax.config.update('jax_default_matmul_precision',
'highest')`` (or the JAX_DEFAULT_MATMUL_PRECISION env var) then asks
Mosaic for an fp32 contract on bf16 vectors — a hard compile error
("Bad lhs type", tpu.matmul). Precision inside these kernels is an
implementation detail (hi/lo splits already deliver the accuracy each
kernel documents), so every kernel body is wrapped to trace under the
default TPU precision regardless of the global setting. Explicit
``precision=`` arguments (the ``exact`` cross terms in neighbors.py)
still override.
"""

from __future__ import annotations

import functools

import jax


def pin_default_matmul_precision(fn):
    """Decorator for Pallas kernel bodies: trace dots at the TPU
    default (bf16) matmul precision, ignoring the global override."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("bfloat16"):
            return fn(*args, **kwargs)

    return wrapped
