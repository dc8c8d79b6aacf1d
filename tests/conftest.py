"""Test config: run the suite on a virtual 8-device CPU mesh.

Tests never need the real TPU chip — sharding/collective correctness is
validated on `--xla_force_host_platform_device_count=8` exactly as the
driver's `dryrun_multichip` does. Must run before jax is imported.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
