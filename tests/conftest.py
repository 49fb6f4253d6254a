"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU runs happen through bench.py / the driver; unit tests validate
semantics and the multi-device sharding path on host CPU devices.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
