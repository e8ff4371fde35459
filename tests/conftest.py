"""Test configuration: run all tests on a virtual 8-device CPU mesh.

The jitted code paths are identical on CPU and TPU (mirroring how the
reference gave every GPU method a CPU twin, /root/reference/README:58-59), so
CI needs no TPU chip. Multi-device sharding tests use the 8 virtual devices.

NOTE this environment force-registers a remote 'axon' TPU backend in every
python process (PYTHONPATH sitecustomize) and exports JAX_PLATFORMS=axon, so
we must OVERRIDE (not setdefault) both the env var and the jax config; tests
must never depend on the TPU tunnel, which is shared and can stall.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the CPU backend; got " + str(jax.devices())
)
