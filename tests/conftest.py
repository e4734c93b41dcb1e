"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Mirrors the multi-device test strategy in SURVEY.md section 4: CPU JAX with
XLA_FLAGS=--xla_force_host_platform_device_count=8 is the TPU analogue of a
fake communication backend, letting sharding/collective tests run without
real chips. Must be set before the first jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
