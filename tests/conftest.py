"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU runs happen through bench.py / the driver; unit tests validate
semantics and the multi-device sharding path on host CPU devices.

The container's sitecustomize registers the axon TPU backend and pins
``jax_platforms`` at interpreter start, so plain JAX_PLATFORMS env overrides
are ineffective — we must update jax.config after import, before any
computation runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
