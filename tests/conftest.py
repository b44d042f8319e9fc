"""Test config: force CPU backend (with an 8-device virtual mesh for sharding
tests) and float64 for MuJoCo-parity comparisons.

Must run before jax initializes a backend — pytest imports conftest first.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def f64():
    import jax.numpy as jnp
    return jnp.float64
