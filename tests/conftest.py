"""Test configuration: force an 8-device virtual CPU platform so
multi-chip sharding paths are exercised without TPU hardware."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax
import numpy as np
import pytest

# XLA's default matmul precision is allowed to drop to bf16-class; parity
# tests compare against fp64 oracles, so pin the highest precision.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
