"""Test configuration: force CPU backend with 8 virtual devices.

All sharding / multi-chip tests run against a virtual 8-device CPU mesh
(`--xla_force_host_platform_device_count=8`), mirroring how the driver
dry-runs the multi-chip path. Real-TPU benchmarks live in bench.py, not here.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The environment's sitecustomize imports jax and pins JAX_PLATFORMS=axon
# (remote TPU tunnel) before this file runs; the env var alone is then
# ignored. jax.config.update works as long as no backend has initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
