"""Test configuration: force an 8-device virtual CPU platform so
multi-chip sharding paths are exercised without TPU hardware.

NOTE: this environment bakes JAX_PLATFORMS=axon (a remote-TPU plugin)
into the interpreter via sitecustomize, which overrides the usual
JAX_PLATFORMS=cpu env convention — the config update below is the only
reliable way to pin tests to CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# XLA's default matmul precision is allowed to drop to bf16-class; parity
# tests compare against fp64 oracles, so pin the highest precision.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
