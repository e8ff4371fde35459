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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Compile at -O1: the suite runs on 1 CPU core and spends ~half its time
# in XLA compiles (the vmapped frontend step alone is ~17 s). Measured:
# O1 cuts compiles ~9% with NEUTRAL execution time and bit-identical
# results (90-frame spin: 132.7 s / ATE 0.0125 at default vs 134.7 s /
# ATE 0.0125 at O1; test_parallel 72.3 -> 65.9 s). O0 was tried and
# REJECTED: 2x slower execution on the system tests (suite 12m52s->20m+).
if "xla_backend_optimization_level" not in flags:
    flags = (flags + " --xla_backend_optimization_level=1").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the CPU backend; got " + str(jax.devices())
)
