"""Test config: run the suite on a virtual 8-device CPU mesh.

Tests never need the real TPU chip — sharding/collective correctness is
validated on ``--xla_force_host_platform_device_count=8`` exactly as the
driver's ``dryrun_multichip`` does, and op-vs-oracle tests are
platform-independent.

Two environment quirks handled here (must run before jax imports):
* this image's sitecustomize registers the ``axon`` TPU backend into
  every python process when ``PALLAS_AXON_POOL_IPS`` is set — clear it;
* ``JAX_PLATFORMS=axon`` is exported globally — override, don't
  setdefault.
"""

import os

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", jax.default_backend()
