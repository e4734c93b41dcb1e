"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Mirrors the multi-device test strategy in SURVEY.md section 4: CPU JAX with
XLA_FLAGS=--xla_force_host_platform_device_count=8 is the TPU analogue of a
fake communication backend, letting sharding/collective tests run without
real chips. Must be set before the first jax import.
"""

import os

# XLA_FLAGS is read lazily at CPU-backend init, so setting it here (before
# any computation runs) still takes effect even though jax was already
# imported by the interpreter's sitecustomize.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The environment may pre-import jax (site customization) with
# JAX_PLATFORMS pointed at a real accelerator; env vars are too late by
# then, but jax.config updates still work before first backend use. Tests
# must run on CPU: golden tests need true float64, which TPU lacks.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
