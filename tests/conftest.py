"""Test configuration: run all tests on a virtual 8-device CPU mesh.

The jitted code paths are identical on CPU and TPU (mirroring how the
reference gave every GPU method a CPU twin, /root/reference/README:58-59), so
CI needs no TPU chip. Multi-device sharding tests use the 8 virtual devices.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
