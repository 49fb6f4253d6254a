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

# Pin the env var too: the package __init__ re-applies JAX_PLATFORMS from
# the environment at import (to make user-level CPU pins work despite the
# sitecustomize override), and the container globally exports
# JAX_PLATFORMS=axon — without this line that re-apply would undo the cpu
# pin below and send the whole suite over the single-chip TPU tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
